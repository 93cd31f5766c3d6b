"""Named query catalog: every implemented operator as a (spark, sf_dir) →
DataFrame callable plus, where expressible, a DuckDB-runnable ANSI-SQL oracle
producing identical column names and values.

This backs ``__spark_entry__.py`` (driver correctness gate) and ``bench.py``.
Funnel-engine queries (fr_*) go through the real QueryEngine/QueryPlan —
they exercise the actual product code path, not hand-written Spark.

Float-valued results are rounded consistently on both sides; thresholds avoid
representable-sum boundaries so double-accumulation order can't flip
memberships.
"""

from __future__ import annotations

import copy
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from funnel_rocket_spark.engine import QueryEngine
from funnel_rocket_spark.operators import (
    audiences,
    behavior,
    dedup,
    multimodal,
    olap,
    ranking,
    sampling,
    similarity,
    skew,
    temporal,
    text,
)

# --------------------------------------------------------------------------- #
# loaders

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Analyzed scan handle for one table, registered once per session.

    ``spark.read.parquet`` pays ~80 ms of driver work per call (file
    listing, footer fetch, schema inference) — and a 133-query bench
    session was re-paying it on every query × run for the same immutable
    files. This memoizes the UNEXECUTED DataFrame handle (an analyzed
    scan plan — schema metadata only, no rows) on the session object,
    the reference engine's register-once dataset model. Every action
    still scans the parquet inputs; nothing computed is reused. The
    cache dies with the session (stored on it), so tests spinning up
    fresh sessions can never see a stale handle.
    """
    cache = getattr(spark, "_frs_scan_cache", None)
    if cache is None:
        cache = {}
        spark._frs_scan_cache = cache
    key = (sf_dir, name)
    if key in cache:
        return cache[key]
    # tz-independent epoch math for NTZ timestamp columns (driver sessions
    # may not have our session.py defaults)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # If events.parquet carries TIMESTAMP(NANOS), read it as int64
        # epoch-nanos directly (nanosAsLong); micro/milli timestamps come
        # back as timestamp(_ntz) and are normalized below.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    cache[key] = df
    return df


# Unique (or near-unique) key per spread-loaded table: hash-partitioning
# on it avoids round-robin's sortBeforeRepartition local sort (see
# load_spread). High cardinality ≫ partition count keeps the spread even.
_SPREAD_KEYS = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "orders": "o_orderkey",
}


def _spread_max_bytes() -> int:
    """Read per call (not at import) so a long-lived session — and an
    interleaved A/B harness — can toggle the spread without reloading."""
    import os

    return int(os.environ.get("FRS_SPREAD_MAX_BYTES", 1 << 30))


def load_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """load_table + a round-robin spread for split-starved inputs.

    The testdata tables are single-file, single-row-group parquet, and a
    parquet row group cannot split across tasks — so every scan is at
    most ONE task no matter the split config, and heavy per-row work
    before the first exchange (tokenize/shingle/hash/percentile
    histograms) serializes on one core of however many the session has.
    This is the optimization guide's input-skew case ("one huge
    unsplittable file ... repartition immediately after the read"),
    applied scale-adaptively: above ``FRS_SPREAD_MAX_BYTES`` (default
    1 GiB) a real dataset has real splits and the spread is skipped, so
    the exchange only ever moves a provably small table. Catalyst still
    pushes later filters through the repartition to the scan (verified:
    PushedFilters intact). Engine (fr_*) queries deliberately do NOT use
    this — their first operation is already a group-keyed exchange, and
    the extra round-robin pass measured 1.2-1.3x pure loss there."""
    import os

    df = load_table(spark, sf_dir, name)
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isfile(path):
            size = os.path.getsize(path)
        else:
            size = sum(
                os.path.getsize(os.path.join(root, f))
                for root, _, files in os.walk(path) for f in files)
    except OSError:
        return df
    if size <= _spread_max_bytes():
        # Hash-spread on the table's unique key rather than round-robin:
        # a keyless repartition(n) locally SORTS its full input rows
        # first (spark.sql.execution.sortBeforeRepartition — needed so
        # retried tasks reproduce the same assignment), charging every
        # spread scan stage a full-row sort. Hashing a deterministic
        # unique key needs no such sort (same r13 A/B as r12's
        # shingle_frame fix: lineitem scan stage 0.25 s/task → ~0.1),
        # spreads evenly (key cardinality ≫ partitions), and is
        # retry-safe (deterministic key, SPARK-38388 does not apply).
        key = _SPREAD_KEYS.get(name)
        par = spark.sparkContext.defaultParallelism
        if key is not None and os.environ.get("FRS_SPREAD_MODE") != "rr":
            df = df.repartition(par, F.col(key))
        else:
            df = df.repartition(par)
    return df


def ts_ns(df: DataFrame, col: str = "ts") -> DataFrame:
    """Replace a timestamp-typed column with exact epoch-nanos int64.

    For operators that do arithmetic on the time axis (sessionization gaps,
    as-of tolerance, time buckets) AFTER any scan-level filtering — engine
    queries never use this (their timeframe predicate must stay on the raw
    column for parquet pushdown; see planner/compiler.py). Long arithmetic is
    exact: casting ~1.7e18 nanos to double would quantize to ~256 ns. The
    NTZ → TIMESTAMP cast is value-preserving under the UTC session timezone
    pinned in load_table, so results hash-match DuckDB's epoch_ns(ts).
    Integer columns (e.g. files already storing TIMESTAMP(NANOS) read via
    nanosAsLong) pass through untouched.
    """
    if isinstance(df.schema[col].dataType, (T.LongType, T.IntegerType)):
        return df
    return df.withColumn(
        col, F.unix_micros(F.col(col).cast(T.TimestampType())) * F.lit(1000))


def _engine() -> QueryEngine:
    return QueryEngine("user_id", "ts")


NANOS_DAY = 86_400 * 10**9
TS_2024_01_05 = 1_704_412_800 * 10**9
TS_2024_01_15 = 1_705_276_800 * 10**9

_COUNTS_SQL_SHELL = """
WITH m AS ({matched}),
     r AS (SELECT count(*) c FROM events WHERE user_id IN (SELECT user_id FROM m))
SELECT (SELECT count(*) FROM m)::BIGINT AS matching_groups,
       (SELECT c FROM r)::BIGINT AS matching_group_rows
"""

# DuckDB prelude shared by document-pipeline oracles: whitespace tokens +
# distinct word 3-gram shingles.
_TOKS_SQL = (
    "SELECT doc_id, text, "
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tk "
    "FROM documents"
)
# cased twin for RECONSTRUCTION operators (chunking, packing, span
# removal): output text must keep the original casing; lowercased tokens
# are for counting/matching only
_TOKS_CASED_SQL = (
    "SELECT doc_id, text, "
    "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk "
    "FROM documents"
)
def _grams_sql(n: int = 3) -> str:
    """Distinct word n-gram shingles (mirrors dedup.word_ngrams)."""
    return (
        "SELECT doc_id, list_distinct(list_transform("
        f"range(1, greatest(len(tk)-{n - 2}, 1)), "
        f"i -> array_to_string(tk[i:i+{n - 1}], ' '))) AS gr "
        "FROM (" + _TOKS_SQL + ")"
    )


_GRAMS_SQL = _grams_sql(3)


# --------------------------------------------------------------------------- #
# funnel-engine queries (the reference's own query shapes, SURVEY §2)

def _fr_counts(query_json: dict, sequence_strategy: str = "auto"):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load_table(spark, sf_dir, "events")
        return _engine().plan(
            df, query_json,
            sequence_strategy=sequence_strategy).counts()

    return fn


def _fr_groups_only(query_json: dict, sequence_strategy: str = "auto"):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load_table(spark, sf_dir, "events")
        return _engine().plan(
            df, query_json,
            sequence_strategy=sequence_strategy).counts().select(
                "matching_groups")

    return fn


def _fr_aggregation(query_json: dict, agg: dict, post=None):
    q = copy.deepcopy(query_json)
    q.setdefault("query", {})["aggregations"] = [agg]

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load_table(spark, sf_dir, "events")
        plan = _engine().plan(df, q)
        ((_agg, out),) = plan.aggregations()
        return post(out) if post else out

    return fn


Q_EMPTY: dict = {}
Q_PURCHASE3 = {"query": {"conditions": [
    {"filter": ["event_type", "==", "purchase"], "target": ["count", ">=", 3]}]}}
Q_ZERO_ERRORS = {"query": {"conditions": [
    {"filter": ["event_type", "==", "error"], "target": ["count", "==", 0]}]}}
Q_SUM_TARGET = {"query": {"conditions": [
    {"filter": ["event_type", "==", "purchase"],
     "target": ["sum", "value", ">", 900.37]}]}}
Q_MULTI_FILTER = {"query": {"conditions": [
    {"filters": [{"column": "event_type", "op": "==", "value": "purchase"},
                 {"column": "value", "op": ">=", "value": 150.0}],
     "target": ["count", ">=", 2]}]}}
Q_RELATION = {"query": {
    "relation": "($0 or $big_errors) and $2",
    "conditions": [
        {"filter": ["event_type", "==", "purchase"]},
        {"name": "big_errors", "filter": ["event_type", "==", "error"],
         "target": ["sum", "value", ">=", 500.37]},
        {"filter": ["event_type", "==", "click"], "target": ["count", ">=", 5]},
    ]}}
Q_TIMEFRAME = {"timeframe": {"from": TS_2024_01_05, "to": TS_2024_01_15},
               "query": {"conditions": [{"filter": ["event_type", "==", "purchase"]}]}}
Q_STRING_OPS = {"query": {"conditions": [
    {"filter": ["props", "contains", '"k": 7}']},
    {"filter": ["props", "not contains", '"k": 1'], "target": ["count", ">=", 10]},
]}}
Q_REGEX = {"query": {"conditions": [
    {"filter": ["props", "regex", '"k": 4[0-9]}']}]}}
Q_PURCHASE1 = {"query": {"conditions": [{"filter": ["event_type", "==", "purchase"]}]}}
Q_SEQUENCE = {"query": {"conditions": [{"sequence": [
    {"filter": ["event_type", "==", "signup"]},
    {"filter": ["event_type", "==", "click"]},
    {"filter": ["event_type", "==", "purchase"]}]}]}}
Q_SEQ_MAXDUR = {"query": {"conditions": [{
    "sequence": [{"filter": ["event_type", "==", "signup"]},
                 {"filter": ["event_type", "==", "purchase"]}],
    "maxDuration": 2 * NANOS_DAY}]}}
Q_SEQ_NOT = {"query": {"conditions": [{"sequence": [
    {"filter": ["event_type", "==", "signup"]},
    {"filter": ["event_type", "==", "error"], "rowFound": False},
    {"filter": ["event_type", "==", "purchase"]}]}]}}
# a SELECTIVE absence step (high-value errors only), so matches are
# non-zero at the driver's sf0.01 (18 groups) — a 0-row gate would pass
# on "nothing matches" without exercising the absence machinery
Q_SEQ_NOT_SEL = {"query": {"conditions": [{"sequence": [
    {"filter": ["event_type", "==", "signup"]},
    {"filters": [["event_type", "==", "error"], ["value", ">", 90.0]],
     "rowFound": False},
    {"filter": ["event_type", "==", "purchase"]}]}]}}
Q_FUNNEL = {"funnel": {"sequence": [
    {"filter": ["event_type", "==", "signup"]},
    {"filter": ["event_type", "==", "click"]},
    {"filter": ["event_type", "==", "purchase"]}]}}

_SEQ_STEPS_SQL = """
s0 AS (SELECT user_id, min(ts) t FROM events WHERE event_type = 'signup' GROUP BY 1),
s1 AS (SELECT e.user_id, min(e.ts) t FROM events e JOIN s0 ON e.user_id = s0.user_id
       AND e.ts > s0.t WHERE e.event_type = 'click' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) t FROM events e JOIN s1 ON e.user_id = s1.user_id
       AND e.ts > s1.t WHERE e.event_type = 'purchase' GROUP BY 1)
"""


def _funnel_steps_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "events")
    return _engine().plan(df, Q_FUNNEL).funnel_step_counts()


def _funnel_step_agg_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """countPerValue(event_type) over rows of groups passing funnel step 1
    (W2 stepAggregations through the real plan path)."""
    df = load_table(spark, sf_dir, "events")
    plan = _engine().plan(df, Q_FUNNEL)
    step_rows = plan.funnel_step_rows(1)
    return plan.aggregation_df(
        {"column": "event_type", "type": "countPerValue", "top": 10}, step_rows)


Q_SEQ_MULTIFILTER = {"query": {"conditions": [{"sequence": [
    {"filters": [{"column": "event_type", "op": "==", "value": "view"},
                 {"column": "value", "op": ">=", "value": 50.0}]},
    {"filter": ["event_type", "==", "purchase"]}]}]}}


def _registration_profile_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "events")
    return df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.count_distinct("user_id").alias("n_groups"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.count_distinct("event_type").alias("n_event_types"),
    )


# --------------------------------------------------------------------------- #
# training-data pipeline operators

Q_LINEITEM = {
    # timeframe in epoch NANOS (l_shipdate is a real timestamp column —
    # exercises the timestamp-literal pushdown path): 1994-01-01 .. 1996-01-01
    "timeframe": {"from": 757_382_400 * 10**9, "to": 820_454_400 * 10**9},
    "query": {
        "relation": "$0 and $1",
        "conditions": [
            {"filter": ["l_discount", ">", 0.05],
             "target": ["sum", "l_extendedprice", ">", 50000.37]},
            {"filter": ["l_returnflag", "==", "N"], "target": ["count", ">=", 2]},
        ],
    },
}


def _fr_lineitem_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "lineitem")
    eng = QueryEngine("l_orderkey", "l_shipdate")
    return eng.plan(df, Q_LINEITEM).counts()


def _text_tokens_fn(spark, sf_dir):
    docs = load_spread(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count(F.col("text")).alias("n_tokens"),
        text.bpe_token_estimate(F.col("text")).alias("n_bpe_tokens"),
    )


def _ann_lsh_pairs_fn(spark, sf_dir):
    # spread: the bucket-assignment Arrow pass (V @ H.T) otherwise runs at
    # the single-row-group file's 1-task scan parallelism; the byte-bound
    # guard keeps a real sharded corpus from paying the extra exchange
    emb = load_spread(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    return similarity.lsh_bucketed_pairs(emb, threshold=0.4, n_bits=4, tables=4,
                                         dim=64)


NANOS_2H = 2 * 3600 * 10**9


def _sessionize_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = ts_ns(load_table(spark, sf_dir, "events"))
    stats = temporal.session_stats(
        ev.select("user_id", "ts"), "user_id", "ts", gap=NANOS_2H)
    # DuckDB truncates TIMESTAMP(NANOS) to us; compare at us precision
    return stats.select(
        "user_id", "session_id", "n_events",
        F.expr("start_ts DIV 1000").alias("start_us"),
        F.expr("end_ts DIV 1000").alias("end_us"),
        (F.expr("end_ts DIV 1000") - F.expr("start_ts DIV 1000")).alias("duration_us"),
    )


def _asof_join_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = ts_ns(load_table(spark, sf_dir, "events"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value"))
    joined = temporal.as_of_join(purchases, clicks, on="user_id",
                                 left_ts="ts", right_ts="ts")
    return joined.select("event_id", "user_id",
                         F.expr("ts DIV 1000").alias("ts_us"), "click_value")


def _asof_forward_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each view paired with the NEXT purchase of that user."""
    ev = ts_ns(load_table(spark, sf_dir, "events"))
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value"))
    joined = temporal.as_of_join(views, purchases, on="user_id",
                                 left_ts="ts", right_ts="ts",
                                 direction="forward")
    return joined.select("event_id", "user_id",
                         F.expr("ts DIV 1000").alias("ts_us"),
                         "purchase_value")


def _range_join_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [(float(lo), float(lo + 40)) for lo in range(0, 200, 40)]
        + [(200.0, 1e9)],
        "band_lo double, band_hi double")
    joined = temporal.range_join(ev.select("event_id", "value"), bands,
                                 point_col="value", lo_col="band_lo",
                                 hi_col="band_hi", bucket_size=40.0)
    return (joined.groupBy("band_lo", "band_hi")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


def _time_rollup_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = ts_ns(load_table(spark, sf_dir, "events"))
    out = temporal.time_rollup(
        ev, "ts", every=NANOS_DAY, group_cols=["event_type"],
        aggs=[F.count(F.lit(1)).alias("n_events"),
              F.round(F.sum("value"), 2).alias("sum_value")])
    return out.select(F.expr("bucket_start DIV 1000").alias("bucket_us"),
                      "event_type", "n_events", "sum_value")


def _ann_ivf_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-probe IVF with a SELF-CERTIFYING contract: per query, emit
    whether recall@k against the in-plan brute-force top-k clears the
    bound — so the driver gets a hash-checkable verdict instead of the
    rows-only ``no_oracle`` this query shipped with through round 3.

    Recall is score-based (an IVF hit counts if its cosine is >= the
    brute-force k-th best), the standard ANN-benchmark definition — it is
    insensitive to tie-ordering between equal-scoring neighbors. Both
    sides round cosine to 6 decimals with identical semantics, so the
    comparison is deterministic run-to-run (seeded k-means quantizer).

    The floor is deliberately conservative: the synthetic test embeddings
    are near-uniform (little cluster structure), so probing 4/16 cells
    measures 0.3-0.9 per-query recall across sf0.001/0.01/0.1; random
    candidate selection would score ~k/N = 2%. The per-query verdict plus
    the exact result cardinality is what the driver hash-checks."""
    k, bound = 10, 0.2
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    # frames quantizer (r13): the deterministic in-repo kmeans_lloyd —
    # 1 seed collect + 2 Lloyd jobs instead of Spark ML fit()'s ~28
    # sequential jobs (k-means|| init passes dominate a one-shot build).
    # Measured recall with it: 0.7-1.0 per query across sf0.001/0.01/0.1
    # vs the 0.2 floor (ML quantizer measured 0.3-0.9 — the swap only
    # WIDENS the certification margin).
    if os.environ.get("FRS_ANN_QUANTIZER") == "ml":  # A/B control shape
        ivf = similarity.ivf_topk(emb, queries, k=k, n_clusters=16,
                                  n_probe=4)
    else:
        ivf = similarity.ivf_topk(emb, queries, k=k, n_clusters=16,
                                  n_probe=4, quantizer="frames", max_iter=2)
    brute = similarity.cosine_topk(emb, queries, k=k)
    kth = brute.groupBy("query_id").agg(F.min("cosine_sim").alias("__kth"))
    per_q = (ivf.join(F.broadcast(kth), "query_id")
             .groupBy("query_id")
             .agg(F.count(F.lit(1)).alias("n_returned"),
                  F.sum(F.when(F.col("cosine_sim") >= F.col("__kth"), 1)
                        .otherwise(0)).alias("__hits")))
    return (queries.select(F.col("vec_id").alias("query_id"))
            .join(F.broadcast(per_q), "query_id", "left")
            .select("query_id",
                    F.coalesce(F.col("n_returned"), F.lit(0))
                    .alias("n_returned"),
                    (F.coalesce(F.col("__hits"), F.lit(0)) / k >= bound)
                    .alias("recall_ok")))


def _ann_ivf_full_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-probe IVF: every cell is searched, so the result is exactly
    brute-force top-k — the one IVF configuration a SQL oracle can check
    value-for-value (the partial-probe entry stays rows-only)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    # frames quantizer with rounds=0 (centers = the 8 lowest-id vectors,
    # no Lloyd jobs at all): quantizer quality is irrelevant when every
    # cell is probed — the result is brute-force-exact for ANY
    # assignment. Replaces ML KMeans(max_iter=1, random init), whose
    # fit() alone was ~8 sequential driver jobs.
    if os.environ.get("FRS_ANN_QUANTIZER") == "ml":  # A/B control shape
        return similarity.ivf_topk(emb, queries, k=10, n_clusters=8,
                                   n_probe=8, max_iter=1,
                                   init_mode="random")
    return similarity.ivf_topk(emb, queries, k=10, n_clusters=8, n_probe=8,
                               quantizer="frames", max_iter=0)


_IVF_INDEX_CACHE: dict = {}


def _ann_ivf_persisted_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN amortization shape (r11): the IVF index is
    built ONCE per process, persisted via ``similarity.save_ivf_index``
    (cell-partitioned parquet + centers.json, crash-safe ordering),
    loaded back, and searched with ``prune_cells=True`` — so the probe
    reads ONLY the probed cells' files (parquet partition pruning; the
    plan gate in tests/test_ivf.py pins it). Same self-certifying
    score-based recall@k contract as ``ann_ivf_topk``; of bench.py's 3
    timed runs, runs 2-3 pay only load + pruned search + the in-plan
    brute-force certification."""
    k, bound = 10, 0.2
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cached = _IVF_INDEX_CACHE.get(sf_dir)
    if cached is None:
        import tempfile

        assigned, centers = similarity.ivf_index(
            emb, n_clusters=16, max_iter=8)
        path = tempfile.mkdtemp(prefix="frs_ivf_index_") + "/idx"
        similarity.save_ivf_index(assigned, centers, path)
        cached = path
        _IVF_INDEX_CACHE[sf_dir] = cached
    assigned, centers = similarity.load_ivf_index(spark, cached)
    ivf = similarity.ivf_search(assigned, centers, queries, k=k,
                                n_probe=4, prune_cells=True)
    brute = similarity.cosine_topk(emb, queries, k=k)
    kth = brute.groupBy("query_id").agg(F.min("cosine_sim").alias("__kth"))
    per_q = (ivf.join(F.broadcast(kth), "query_id")
             .groupBy("query_id")
             .agg(F.count(F.lit(1)).alias("n_returned"),
                  F.sum(F.when(F.col("cosine_sim") >= F.col("__kth"), 1)
                        .otherwise(0)).alias("__hits")))
    return (queries.select(F.col("vec_id").alias("query_id"))
            .join(F.broadcast(per_q), "query_id", "left")
            .select("query_id",
                    F.coalesce(F.col("n_returned"), F.lit(0))
                    .alias("n_returned"),
                    (F.coalesce(F.col("__hits"), F.lit(0)) / k >= bound)
                    .alias("recall_ok")))


_RETRIEVAL_CACHE: dict = {}


def _retrieval_stage_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r12 STAGED form of persisted-IVF retrieval: the ``retrieval``
    pipeline stage builds (or resumes) the ``workdir/models/ivf_<key>``
    artifact — the same one ``dedup_semantic persist_index`` writes —
    and reports each benchmark query's top-k nearest LIVE corpus
    neighbors to ``workdir/reports/retrieval.parquet`` with
    ``prune_cells=True`` partition-pruned search. This entry runs the
    pipeline (first run builds, later runs resume via the chain
    checkpoint — FIXTURE_AMORTIZED), reads the report back, and wraps
    it in the same self-certifying score-based recall@k contract as
    ``ann_ivf_persisted``: per query, result cardinality plus whether
    enough returned scores reach the brute-force kth score."""
    k, bound = 10, 0.2
    emb = load_table(spark, sf_dir, "embeddings")
    base = _RETRIEVAL_CACHE.get(sf_dir)
    if base is None:
        import tempfile

        base = tempfile.mkdtemp(prefix="frs_retrieval_")
        (emb.filter(F.col("vec_id") < 5)
         .write.mode("overwrite").parquet(base + "/queries"))
        _RETRIEVAL_CACHE[sf_dir] = base
    from funnel_rocket_spark.pipeline import run_pipeline

    run_pipeline(spark, {
        "input": {"path": f"{sf_dir}/documents.parquet"},
        "workdir": base + "/work",
        "stages": [{"stage": "retrieval",
                    "embeddings_path": f"{sf_dir}/embeddings.parquet",
                    "queries_path": base + "/queries",
                    "k": 16, "rounds": 2, "top_k": k, "n_probe": 4}]})
    hits = spark.read.parquet(base + "/work/reports/retrieval.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    brute = similarity.cosine_topk(emb, queries, k=k)
    kth = brute.groupBy("query_id").agg(F.min("cosine_sim").alias("__kth"))
    per_q = (hits.join(F.broadcast(kth), "query_id")
             .groupBy("query_id")
             .agg(F.count(F.lit(1)).alias("n_returned"),
                  F.sum(F.when(F.col("cosine_sim") >= F.col("__kth"), 1)
                        .otherwise(0)).alias("__hits")))
    return (queries.select(F.col("vec_id").alias("query_id"))
            .join(F.broadcast(per_q), "query_id", "left")
            .select("query_id",
                    F.coalesce(F.col("n_returned"), F.lit(0))
                    .alias("n_returned"),
                    (F.coalesce(F.col("__hits"), F.lit(0)) / k >= bound)
                    .alias("recall_ok")))


_SORTED_LAYOUT_CACHE: dict = {}


def _fr_sequence_sorted_layout_fn(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The r12 declared-layout path end-to-end: events written once per
    sf_dir as a ``bucketBy(user_id) sortBy(user_id, ts)`` table
    (``sources.write_bucketed`` aligns one file per bucket —
    FIXTURE_AMORTIZED), then the standard 3-step sequence planned WITH
    the catalog layout record. The plan must stay on window anchors
    (``sorted_layout_window`` routing), contain NO Sort node, and
    return exactly the plain-parquet answer — the oracle checks the
    values, the ``sort_free`` column self-certifies the plan shape."""
    from funnel_rocket_spark.plans import count_sorts
    from funnel_rocket_spark.sources.ingest import write_bucketed

    tbl = _SORTED_LAYOUT_CACHE.get(sf_dir)
    if tbl is None:
        tbl = "events_sorted_layout_" + "".join(
            c if c.isalnum() else "_" for c in sf_dir).strip("_")
        if not spark.catalog.tableExists(tbl):
            write_bucketed(load_table(spark, sf_dir, "events"), tbl,
                           "user_id", num_buckets=8, sort_col="ts")
        _SORTED_LAYOUT_CACHE[sf_dir] = tbl
    layout = {"buckets": 8, "bucket_columns": ["user_id"],
              "sort_columns": ["user_id", "ts"]}
    plan = _engine().plan(spark.table(tbl), Q_SEQUENCE, layout=layout,
                          total_rows=10**8, group_rows_topk=[5_000_000])
    counts = plan.counts()
    sort_free = (count_sorts(counts) == 0
                 and plan.auto_route_reason == "sorted_layout_window")
    return counts.select("matching_groups", "matching_group_rows",
                         F.lit(sort_free).alias("sort_free"))


_PQ_INDEX_CACHE: dict = {}


def _ann_ivfpq_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (product-quantized residuals, ADC search) with the same
    self-certifying contract as ``ann_ivf_topk``: per query, result
    cardinality plus a score-based recall@k verdict against the in-plan
    brute force. Full probe isolates PQ quantization error from cell
    routing. The searched configuration is the production one — ADC
    candidates exactly re-ranked against raw vectors (FAISS Refine):
    quantization then only has to KEEP true neighbors inside the ADC
    top-100, not rank them. Measured reranked recall 0.6-1.0 across
    sf0.001/0.01/0.1 on near-uniform random embeddings (PQ's worst case;
    random candidate selection scores ~2%); floor 0.5 with a one-hit
    margin. The planted-near-dup pytest covers the clustered workload,
    where the 1M-vector rung measures 0.94-0.99."""
    k, bound = 10, 0.5
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    # rounds/max_iter trimmed: with full probe + exact rerank the
    # quantizer only shapes the candidate ORDER inside the ADC top-100,
    # so converged codebooks buy nothing the contract can see. The index
    # (codes parquet + centers + codebooks) is built ONCE per process and
    # round-tripped through parquet — the production amortization shape,
    # same treatment as the incremental-LSH band table; of bench.py's 3
    # timed runs, runs 2-3 pay only search + brute-force + rerank.
    cached = _PQ_INDEX_CACHE.get(sf_dir)
    if cached is None:
        import tempfile

        codes, centers, cb = similarity.ivf_pq_index(
            emb, n_clusters=8, m=8, n_bits=6, rounds=2, max_iter=2)
        path = tempfile.mkdtemp(prefix="frs_pq_index_")
        codes.write.mode("overwrite").parquet(path)
        cached = (path, centers, cb)
        _PQ_INDEX_CACHE[sf_dir] = cached
    path, centers, cb = cached
    codes = spark.read.parquet(path)
    pq = similarity.ivf_pq_search(codes, centers, cb, queries, k=k,
                                  n_probe=8, rerank_with=emb,
                                  rerank_depth=100)
    brute = similarity.cosine_topk(emb, queries, k=k)
    kth = brute.groupBy("query_id").agg(F.min("cosine_sim").alias("__kth"))
    qv = queries.select(F.col("vec_id").alias("query_id"),
                        F.col("embedding").alias("__qv"))
    truth = (pq.join(emb.select("vec_id", "embedding"), "vec_id")
             .join(F.broadcast(qv), "query_id")
             .select("query_id", "vec_id",
                     F.round(similarity.cosine(
                         "cast(embedding as array<double>)",
                         "cast(__qv as array<double>)"), 6)
                     .alias("__true")))
    per_q = (truth.join(F.broadcast(kth), "query_id")
             .groupBy("query_id")
             .agg(F.count(F.lit(1)).alias("n_returned"),
                  F.sum(F.when(F.col("__true") >= F.col("__kth"), 1)
                        .otherwise(0)).alias("__hits")))
    return (queries.select(F.col("vec_id").alias("query_id"))
            .join(F.broadcast(per_q), "query_id", "left")
            .select("query_id",
                    F.coalesce(F.col("n_returned"), F.lit(0))
                    .alias("n_returned"),
                    (F.coalesce(F.col("__hits"), F.lit(0)) / k >= bound)
                    .alias("recall_ok")))


def _olap_percentiles_approx_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK-sketch percentiles with a SELF-CERTIFYING contract.

    ``percentile_approx`` (Greenwald-Khanna) is the 100 TB default when
    cent-exact quantiles aren't required: mergeable, map-side combinable,
    bounded buffers — where native exact percentile is holistic. Sketch
    values are engine-specific (DuckDB's approx_quantile is t-digest), so
    instead of comparing values the query recomputes each returned value's
    TRUE rank bracket in-plan and emits the verdict against GK's published
    guarantee (rank error <= N/accuracy): scalar rows the driver's
    canonicalizer can sort (the r3 array-typed output crashed it) and an
    oracle can hash-check."""
    pcts, acc = [0.5, 0.95], 10_000
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_returnflag", "l_extendedprice"))
    approx = (li.groupBy("l_returnflag")
              .agg(F.percentile_approx("l_extendedprice", pcts, acc)
                   .alias("__pa"),
                   F.count("l_extendedprice").alias("__n")))
    ex = (approx.select("l_returnflag", "__n",
                        F.posexplode("__pa").alias("__pos", "__v"))
          .withColumn("percentile",
                      F.element_at(F.array(*[F.lit(p) for p in pcts]),
                                   F.col("__pos") + 1)))
    ranks = (li.join(F.broadcast(ex), "l_returnflag")
             .groupBy("l_returnflag", "percentile", "__n", "__v")
             .agg(F.sum(F.when(F.col("l_extendedprice") < F.col("__v"), 1)
                        .otherwise(0)).alias("__rank_lt"),
                  F.sum(F.when(F.col("l_extendedprice") <= F.col("__v"), 1)
                        .otherwise(0)).alias("__rank_le")))
    target = F.col("percentile") * F.col("__n")
    slack = F.col("__n") / acc + 1  # GK bound + discretization
    ok = ((F.col("__rank_lt") <= target + slack)
          & (F.col("__rank_le") >= target - slack))
    return ranks.select("l_returnflag", "percentile",
                        ok.alias("within_bound"))


def _olap_percentiles_sketch_only_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENCH twin of :func:`_olap_percentiles_approx_fn`: the GK sketch
    alone, without the in-plan exact-rank certification. The correctness
    gate keeps running the self-certifying version (the certification is a
    CONTRACT, checked at sf0.01 per round); timing it as the operator's
    cost double-charged the sketch (~0.45→0.75 s at sf0.1) for work a
    production query never does. Registered via :data:`BENCH_VARIANTS`,
    which overrides the TIMED fn for the catalog name below — the
    correctness gate runs :func:`_olap_percentiles_sketch_cert_fn`, which
    certifies the values this exact sketch aggregate produces."""
    pcts, acc = [0.5, 0.95], 10_000
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_returnflag", "l_extendedprice"))
    return (li.groupBy("l_returnflag")
            .agg(F.percentile_approx("l_extendedprice", pcts, acc)
                 .alias("approx_pcts")))


def _olap_percentiles_sketch_cert_fn(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Self-certifying contract for the sketch-only bench twin (closes the
    one bench row that had never had a correctness check in rounds ≤6):
    the SAME GK sketch aggregate as :func:`_olap_percentiles_sketch_only_fn`
    joined against the exact per-group percentile, asserting each sketch
    value lies within a declared relative error of the exact value —
    the same self-certification pattern as ``fr_agg_groups_per_value_approx``
    (assert the approximation's own guarantee in-plan; sketch values are
    engine-specific so a value-level cross-engine oracle can't exist).
    ``rel_err=0.005`` is ~10× the worst observed deviation across
    sf0.001/0.01/0.1 (GK at accuracy=10_000 has rank error ≤ N/10_000,
    which on lineitem's smooth price distribution is ≲5·10⁻⁴ in value).
    Deterministic per dataset: GK has no run-to-run seed."""
    pcts, acc, rel_err = [0.5, 0.95], 10_000, 0.005
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_returnflag", "l_extendedprice"))
    # ONE groupBy carries both the sketch and the exact reference — a
    # single scan + single exchange (a join of two separate aggregates
    # would scan lineitem twice for the same certification)
    both = (li.groupBy("l_returnflag")
            .agg(F.percentile_approx("l_extendedprice", pcts, acc)
                 .alias("__pa"),
                 F.percentile("l_extendedprice",
                              F.array(*[F.lit(p) for p in pcts]))
                 .alias("__ex")))
    ex = (both
          .select("l_returnflag", "__ex",
                  F.posexplode("__pa").alias("__pos", "__v"))
          .withColumn("percentile",
                      F.element_at(F.array(*[F.lit(p) for p in pcts]),
                                   F.col("__pos") + 1))
          .withColumn("__e", F.element_at("__ex", F.col("__pos") + 1)))
    within = (F.abs(F.col("__v") - F.col("__e"))
              <= rel_err * F.greatest(F.abs(F.col("__e")), F.lit(1e-9)))
    return ex.select("l_returnflag", "percentile",
                     within.alias("within_rel_err"))


def _fr_groups_approx_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx=true swaps groupsPerValue's exact countDistinct for HLL
    approx_count_distinct — the 100 TB path when a per-value
    distinct-group expand stops being worth it. Sketch values are
    engine-specific (DuckDB's HLL differs bit-wise), so the contract is
    SELF-CERTIFYING like ann_ivf_topk: per value, emit whether the HLL
    estimate's relative error vs the exact twin clears 3x the default
    rsd (0.05) — measured 0.0/0.0067/0.067 across sf0.001/0.01/0.1,
    deterministic per dataset (Spark's HLL++ has no run-to-run seed)."""
    q = {"query": {"aggregations": [
        {"column": "event_type", "type": "groupsPerValue",
         "approx": True, "top": 10}]}}
    df = load_table(spark, sf_dir, "events")
    plan = _engine().plan(df, q)
    ((_agg, out),) = plan.aggregations()
    approx_col = out.columns[1]  # (value, groups) per the exact twin
    exact = (df.groupBy(F.col("event_type").alias("value"))
             .agg(F.countDistinct("user_id").alias("__exact")))
    return (out.join(F.broadcast(exact), "value")
            .select("value",
                    (F.abs(F.col(approx_col) - F.col("__exact"))
                     / F.col("__exact") <= 0.15).alias("within_tol")))


def _olap_pricing_summary_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: wide grouped aggregation with
    arithmetic expressions — exercises multi-aggregate partial/final plans."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _olap_top_orders_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: 3-way join (broadcast dims) + grouped revenue +
    exact top-k with deterministic ties."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # Shrink orders FIRST (segment keeps ~1/5): the big lineitem join then
    # sees a reduced build side AQE can broadcast — lineitem never shuffles
    # for the join, only for the final orderkey aggregate.
    sel_orders = (orders.join(F.broadcast(cust),
                              orders.o_custkey == cust.c_custkey)
                  .select("o_orderkey"))
    return (
        li.join(sel_orders, li.l_orderkey == sel_orders.o_orderkey)
        .groupBy(F.col("o_orderkey").alias("orderkey"))
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


def _olap_revenue_filter_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped: selective predicate (pushdown-friendly) + scalar agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_rows"))
    )


# thresholds sit at the per-user count median so all three Venn segments
# are populated at every SF
Q_HEAVY_PURCHASE = {"query": {"conditions": [
    {"filter": ["event_type", "==", "purchase"],
     "target": ["count", ">=", 14]}]}}
Q_HEAVY_ERROR = {"query": {"conditions": [
    {"filter": ["event_type", "==", "error"],
     "target": ["count", ">=", 14]}]}}


def _audience_segments_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Venn decomposition of two engine audiences (heavy purchasers vs
    heavy-error users) — §2.8 set ops made user-facing."""
    ev = load_table(spark, sf_dir, "events")
    eng = _engine()
    a = eng.plan(ev, Q_HEAVY_PURCHASE).matching_group_ids()
    b = eng.plan(ev, Q_HEAVY_ERROR).matching_group_ids()
    return audiences.audience_segments(a, b, "user_id")


def _olap_percentiles_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles (absent from the reference's aggregation
    set, SURVEY §2.4), in histogram form (`operators/olap.py`): native
    `percentile` is a holistic aggregate that funnels every raw value
    through one reduce task per group (3 here), while the histogram keeps
    partial aggregation map-side and interpolates identically to DuckDB's
    quantile_cont — values match bit-for-bit modulo rounding."""
    li = load_spread(spark, sf_dir, "lineitem")
    # Percentiles over integer CENTS: even-count groups interpolate at the
    # exact midpoint of two prices, and (a+b)/2 over 2-decimal dollars lands
    # on half-cent boundaries where the engines' fp rounding disagrees by one
    # ulp. Integer inputs make the g=0.5 interpolation exact on both sides.
    # Both measured columns ride ONE scan + ONE histogram exchange (the
    # _multi stacked form; the two-call + join shape pays a second full
    # scan/shuffle — same-session A/B 2.03 → 1.81 s at sf0.1).
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    p = olap.grouped_exact_percentiles_multi(
        li, ["l_returnflag"],
        {"cents": cents, "qty": F.col("l_quantity")},
        {"p50_cents": ("cents", 0.5), "p95_cents": ("cents", 0.95),
         "p25_qty": ("qty", 0.25)})
    return p.select(
        "l_returnflag",
        F.round("p50_cents", 2).alias("p50_cents"),
        F.round("p95_cents", 2).alias("p95_cents"),
        F.round("p25_qty", 2).alias("p25_qty"),
    )


def _olap_rollup_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP (absent from the reference — no grouping sets at
    all): subtotal rows per returnflag and a grand total in one pass.
    Spark expands the rollup map-side into the grouping-set union, still a
    single exchange. Group columns coalesced to 'ALL' so the subtotal rows
    are plain values (and hash identically in the oracle compare)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows", "sum_qty")
    )


def _olap_distinct_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregation modifier (absent from the reference): exact
    distinct part/supplier counts per returnflag. Spark plans this as
    expand + two-phase aggregate; `approx_count_distinct` is the sketch
    path already used by the engine's `approx` option."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n_parts"),
             F.countDistinct("l_suppkey").alias("n_supps"),
             F.round(F.sum_distinct(F.col("l_quantity")), 2)
             .alias("sum_distinct_qty"))
    )


def _olap_grouping_sets_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube specialize):
    hand-picked combinations ((flag, status), (flag), ()) — e.g. "by flag
    with and without status, plus a grand total" — in ONE pass/exchange.
    The DataFrame groupingSets API (Spark 4) expands map-side exactly like
    cube/rollup; NULL markers coalesced for oracle-stable values."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows", "sum_price")
    )


def _olap_cube_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE (absent from the reference, like all grouping sets):
    all 4 grouping combinations in one pass. Spark expands the cube
    map-side into the grouping-set union — still ONE exchange, same as the
    rollup; NULL markers coalesced to 'ALL' for oracle-stable values."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows", "sum_price")
    )


def _olap_deciles_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global decile segmentation of customers by total spend via
    olap.exact_ntile — exact ntile(10) semantics WITHOUT the
    single-partition global window (range shuffle + per-partition
    row_number + offset arithmetic; see the operator docstring). Spend is
    rounded to cents before ranking so the frontier is engine-stable."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = (o.groupBy("o_custkey")
                .agg(F.round(F.sum("o_totalprice"), 2).alias("spend")))
    d = olap.exact_ntile(per_cust, 10,
                         [F.desc("spend"), F.asc("o_custkey")],
                         out_col="decile")
    return (d.groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.round(F.sum("spend"), 2).alias("total_spend"),
                 F.round(F.min("spend"), 2).alias("min_spend"),
                 F.round(F.max("spend"), 2).alias("max_spend")))


def _retention_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle (operators/behavior.py) — the
    classic follow-on to the reference's funnel counts, absent there."""
    ev = ts_ns(load_table(spark, sf_dir, "events"))
    return behavior.retention_cohorts(
        ev.select("user_id", "ts"), "user_id", "ts",
        period=behavior.NANOS_WEEK)


def _top_paths_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-step event paths; (ts, event_id) total order makes
    the lead() windows deterministic across engines."""
    ev = ts_ns(load_table(spark, sf_dir, "events"))
    return behavior.top_paths(
        ev, "user_id", "ts", "event_type",
        order_cols=["ts", "event_id"], length=3, top=20)


def _attribution_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution of purchases to the most recent preceding
    view/click — one carry-forward window, no join."""
    ev = ts_ns(load_table(spark, sf_dir, "events"))
    return behavior.last_touch_attribution(
        ev, "user_id", "ts", "event_type", conversion="purchase",
        touch_types=["view", "click"], value_col="value",
        order_col="event_id")


def _conversion_delay_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of days from first view to first subsequent purchase."""
    ev = ts_ns(load_table(spark, sf_dir, "events"))
    return behavior.conversion_delay(
        ev, "user_id", "ts", "event_type", start="view", end="purchase",
        bucket=behavior.NANOS_DAY)


def _cents(col: str):
    # exact integer cents: fp-accumulation-proof sums that hash-match any
    # engine (2-decimal money in double is exact; ×100 round-trips)
    return F.round(F.col(col) * 100).cast("long")


def _rolling_revenue_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling revenue over the pre-aggregated daily series."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "cents", _cents("o_totalprice"))
    return olap.rolling_time_agg(
        o, "o_orderdate", "cents", window_periods=7, period="day")


def _nation_share_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue share per nation within its region: star join (all dims
    broadcast — the fact table never shuffles for a join) + window share
    over the tiny aggregate."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.withColumn("cents", _cents("o_totalprice"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return olap.window_share(joined, ["n_name"], ["r_name"], "cents")


def _basket_pairs_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part pairs co-purchased in the same order (market-basket mining)."""
    li = load_table(spark, sf_dir, "lineitem")
    return olap.basket_pairs(li, "l_orderkey", "l_partkey",
                             min_support=2, top=50)


def _retention_rates_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/D7 retention rates per daily cohort — the classic KPI on top of
    the cohort machinery."""
    ev = ts_ns(load_table(spark, sf_dir, "events"))
    return behavior.retention_rates(
        ev.select("user_id", "ts"), "user_id", "ts",
        period=behavior.NANOS_DAY, horizons=[1, 7])


def _funnel_step_timing_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-between-funnel-steps distribution: for each transition of the
    signup→click→purchase funnel, how many groups complete it and the
    median gap — the funnel anchors (planner/compiler.py, strict-> chain)
    composed with the exact histogram percentile operator
    (operators/olap.py). Gaps are int64 nanos, so the p50 interpolation
    is exact on both engines."""
    from funnel_rocket_spark.planner.compiler import (
        compile_sequence,
        with_sequence_anchors,
    )

    ev = ts_ns(load_table(spark, sf_dir, "events"))
    spec = compile_sequence(
        [{"filter": {"column": "event_type", "op": "==", "value": v}}
         for v in ("signup", "click", "purchase")], prefix="__t_")
    anchored = with_sequence_anchors(ev, spec, "user_id", "ts")
    per_group = anchored.groupBy("user_id").agg(
        *[F.first(spec.anchor(i)).alias(f"__a{i}") for i in range(3)])
    gaps = None
    for i in (1, 2):
        g = (per_group.filter(F.col(f"__a{i}").isNotNull())
             .select(F.lit(i).alias("step"),
                     (F.col(f"__a{i}") - F.col(f"__a{i - 1}"))
                     .alias("__gap")))
        gaps = g if gaps is None else gaps.unionAll(g)
    p = olap.grouped_exact_percentiles(
        gaps, ["step"], F.col("__gap"), {"p50_gap_ns": 0.5})
    n = gaps.groupBy("step").agg(F.count(F.lit(1)).alias("n_groups"))
    return (n.join(p, "step")
            .select("step", "n_groups",
                    F.round("p50_gap_ns", 1).alias("p50_gap_ns")))


def _session_funnel_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel scoped to 2h-gap sessions: does a single visit view→purchase
    (vs the whole-history funnel the engine runs)."""
    ev = ts_ns(load_table(spark, sf_dir, "events"))
    return behavior.session_funnel(
        ev, "user_id", "ts", "event_type", ["view", "purchase"],
        gap=NANOS_2H)


NANOS_30M = 30 * 60 * 10**9


def _session_funnel_bounded_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_funnel with the engine's sequence extensions: maxDuration
    bounds steps ≥1 to 30min after the session's first view, and the
    rowFound:false middle step requires NO error after the view (within
    the same session and duration window)."""
    ev = ts_ns(load_table(spark, sf_dir, "events"))
    return behavior.session_funnel(
        ev, "user_id", "ts", "event_type",
        ["view", {"type": "error", "rowFound": False}, "purchase"],
        gap=NANOS_2H, max_duration=NANOS_30M)


def _pii_redact_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub differential: synthetic emails/IPs/phones appended to each
    doc (identically in the SQL oracle), then text.redact_pii — a pure
    regexp_replace projection whose patterns run verbatim on both Java
    regex and RE2, so redacted text AND redaction counts value-match."""
    docs = load_spread(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact u"), F.col("doc_id"),
            F.lit("@example.com ip 10.0.0."), F.col("doc_id") % 256,
            F.lit(" tel +1-555-0100-1234"),
        ).alias("text"))
    return text.redact_pii(docs)


def _promo_share_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo revenue share per ship month: one broadcast
    dim join (part never shuffles the fact), conditional integer-cents
    sums, share = one double division — engine-exact."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "cents", _cents("l_extendedprice"))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("cents"))
                  .otherwise(F.lit(0))).alias("promo_cents")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("month"))
        .agg(promo, F.sum("cents").alias("total_cents"))
        .withColumn("promo_share",
                    F.round(F.col("promo_cents") / F.col("total_cents"), 6))
    )


def _token_entropy_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each doc's token distribution — perplexity
    proxy for curation banding."""
    return text.token_entropy(load_spread(spark, sf_dir, "documents"))


def _part_avg_filter_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style correlated aggregate: lineitems below 20% of their
    part's average quantity. The per-part limit is a pre-aggregate joined
    back on the SAME key the fact already groups by — an agg-to-fact
    shuffle join AQE turns broadcast when the part table allows; never a
    correlated subquery per row. Integer-cents revenue, fp-proof."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "cents", _cents("l_extendedprice"))
    lim = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("lim"))
    return (
        li.join(lim, "l_partkey")
        .where(F.col("l_quantity") < F.col("lim"))
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum("cents").alias("revenue_cents"))
    )


def _winsorized_mean_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust mean: clamp to the per-group [p5, p95] band (exact
    histogram percentiles), then average. Floor-to-cent clamps keep every
    value integral so the mean is an exact-int sum over count — bit-stable
    across engines regardless of accumulation order.

    The mean is computed FROM THE VALUE HISTOGRAM the band already needs
    (Σ clamp(v)·c / Σ c over distinct values — identical exact-integer
    sum, identical count), not by re-scanning the fact table: one lineitem
    pass instead of two, and the only full-width exchange is the histogram
    build (guide §8: decide on the lightweight proxy). Both branches share
    ONE histogram via ReusedExchange."""
    li = load_spread(spark, sf_dir, "lineitem").withColumn(
        "cents", _cents("l_extendedprice"))
    hist = olap.grouped_value_histogram(li, ["l_returnflag"], F.col("cents"))
    band = olap.percentiles_from_histogram(
        hist, ["l_returnflag"], {"p05": 0.05, "p95": 0.95}
    ).select("l_returnflag", F.floor("p05").alias("lo"),
             F.floor("p95").alias("hi"))
    clamped = F.least(F.greatest(F.col("__v"), F.col("lo")), F.col("hi"))
    nn = F.col("__v").isNotNull()
    return (
        hist.join(F.broadcast(band), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(F.sum("__c").alias("n_rows"),
             F.round(F.sum(F.when(nn, clamped * F.col("__c")))
                     / F.sum(F.when(nn, F.col("__c"))), 4)
             .alias("winsorized_mean_cents"))
    )


NANOS_HOUR = 3600 * 10**9


def _asof_tolerance_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """as_of_join's tolerance path: views matched to the latest click at
    most 1 hour back; matches farther away null out (pd.merge_asof
    semantics). Integer-µs delay sum — exact in any engine."""
    ev = ts_ns(load_table(spark, sf_dir, "events"))
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"))
    j = temporal.as_of_join(views, clicks, on="user_id", left_ts="ts",
                            right_ts="click_ts", value_cols=["click_ts"],
                            tolerance=NANOS_HOUR)
    return j.agg(
        F.count(F.lit(1)).alias("n_views"),
        F.count("click_ts").alias("n_matched"),
        F.sum(F.expr("(ts - click_ts) DIV 1000")).alias("sum_delay_us"))


def _tfidf_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    return text.tfidf_top_terms(docs, top=3)


def _embedding_centroids_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """label_centroids flattened to (label, pos, val) rows so the DuckDB
    oracle compares element-wise means value-by-value."""
    emb = load_table(spark, sf_dir, "embeddings")
    cent = similarity.label_centroids(emb)
    return (cent.select("label", "n_vectors",
                        F.posexplode("centroid").alias("pos", "val"))
            .select("label", "pos",
                    F.round("val", 6).alias("centroid_val"), "n_vectors"))


def _olap_join_chain_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: 5-table star join chain (region → nation → customer
    → orders → lineitem ⨝ supplier with the nation-match condition).

    Scale shape: the selective dim chain (region filter keeps 1/5 of
    nations) collapses into one broadcast per step, so the lineitem fact
    NEVER shuffles for a join — only the final ~nations-sized groupBy
    exchanges. supplier is an explicit broadcast (dimension-sized at any
    SF); the customer-derived frame is left to AQE, which broadcasts it
    while it fits and degrades to shuffle join at extreme SF."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")

    nations = (nation.join(F.broadcast(region),
                           nation.n_regionkey == region.r_regionkey)
               .select("n_nationkey", "n_name"))
    sel_cust = (cust.join(F.broadcast(nations),
                          cust.c_nationkey == F.col("n_nationkey"))
                .select("c_custkey", "c_nationkey", "n_name"))
    sel_orders = (orders.join(sel_cust, orders.o_custkey == sel_cust.c_custkey)
                  .select("o_orderkey", "c_nationkey", "n_name"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(sel_orders, li.l_orderkey == sel_orders.o_orderkey)
        .join(F.broadcast(supp),
              (li.l_suppkey == supp.s_suppkey)
              & (F.col("c_nationkey") == supp.s_nationkey))
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def _olap_pivot_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT / crosstab (absent from the reference): order counts by
    priority × status. Explicit pivot values keep the schema static —
    without them Spark runs an extra distinct job to discover columns,
    and the plan can't be reasoned about at 100 TB. Physically this is
    one conditional-count aggregate pass: a single exchange on the
    groupBy key, no join, no extra scan."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
        .orderBy("o_orderpriority")
    )


def _event_gap_stats_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window breadth (reference has no rank/lag/lead at all,
    SURVEY §2.5): per-user inter-event gaps via lag() over (user, ts),
    aggregated per event type. One window exchange on user_id — the same
    partitioning every per-group engine pass uses, so at scale this
    coexists with funnels on a bucketed-by-user layout with zero extra
    shuffles. Gap math in truncated µs (ts is epoch-nanos int64; the
    DuckDB oracle's TIMESTAMP carries µs) with (ts, event_id) ordering so
    same-timestamp ties are deterministic in both engines; integer
    sums/counts dodge fp accumulation-order entirely."""
    ev = ts_ns(load_table(spark, sf_dir, "events"))
    from pyspark.sql import Window

    base = ev.select(
        "user_id", "event_id", "event_type", "ts",
        F.expr("ts DIV 1000").alias("__ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = base.withColumn(
        "gap_us", F.col("__ts_us") - F.lag("__ts_us").over(w))
    return (
        gapped.groupBy("event_type")
        .agg(F.count("gap_us").alias("n_gaps"),
             F.sum("gap_us").alias("sum_gap_us"),
             F.max("gap_us").alias("max_gap_us"))
        .orderBy("event_type")
    )


def _dedup_exact_fn(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    groups = dedup.exact_duplicates(docs, min_count=1)
    return groups.agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("n_docs").alias("n_docs"),
        F.sum(F.when(F.col("n_docs") >= 2, F.col("n_docs") - 1).otherwise(0))
        .alias("n_redundant"),
    )


def _jaccard_pairs_fn(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5)


def _minhash_pairs_fn(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=8, n=3, threshold=0.5)


def _simhash_fn(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    return dedup.simhash16_table(docs)


def _text_stats_fn(spark, sf_dir):
    return text.text_stats(load_spread(spark, sf_dir, "documents"))


def _text_quality_fn(spark, sf_dir):
    return text.quality_score(load_spread(spark, sf_dir, "documents"))


def _langid_fn(spark, sf_dir):
    return text.language_id(load_spread(spark, sf_dir, "documents"))


def _text_repetition_fn(spark, sf_dir):
    # single-file parquet = one input partition; spread the interpreted
    # zip_with work across cores before the CPU-bound projection
    docs = load_spread(spark, sf_dir, "documents")
    return text.repetition_stats(
        docs.repartition(spark.sparkContext.defaultParallelism))


def _hash_sample_fn(spark, sf_dir):
    docs = load_spread(spark, sf_dir, "documents")
    return sampling.hash_sample(docs, 0.25).select("doc_id")


def _stratified_sample_fn(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = sampling.stratified_hash_sample(
        ev, {"view": 0.1, "purchase": 1.0}, "event_type", id_col="user_id")
    return out.select("event_id", "user_id", "event_type")


def _weighted_sample_fn(spark, sf_dir):
    docs = load_spread(spark, sf_dir, "documents")
    return sampling.weighted_hash_sample(
        docs, n=50, weight_col="n_chars").select("doc_id", "n_chars")


def _chunk_documents_fn(spark, sf_dir):
    docs = load_spread(spark, sf_dir, "documents")
    return text.chunk_documents(
        docs.repartition(spark.sparkContext.defaultParallelism),
        max_tokens=16)


def _vocabulary_fn(spark, sf_dir):
    docs = load_spread(spark, sf_dir, "documents")
    return text.vocabulary(docs, min_count=5, top=200)


def _pack_blocks_fn(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return text.pack_token_blocks(docs, block_size=128, shards=8)


def _top_docs_fn(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return ranking.top_k_per_group(
        docs, ["lang"], [F.desc("n_chars"), F.asc("doc_id")], k=3,
    ).select("lang", "doc_id", "n_chars", "rnk")


def _fingerprint_fn(spark, sf_dir):
    return text.fingerprint(load_spread(spark, sf_dir, "documents"))


def _ann_topk_fn(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.cosine_topk(emb, queries, k=10)


def _embedding_pairs_fn(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    return similarity.embedding_dup_pairs(emb, threshold=0.45)


def _semantic_contamination_fn(spark, sf_dir):
    """Cross-set semantic decontamination: the vec_id%10==3 slice plays
    the benchmark suite; every corpus vector within 0.45 cosine of any
    eval vector is a hit (leaked eval members surface as their own
    self-hit at cosine 1). Broadcast tier: eval matrix broadcast, one
    zero-shuffle GEMM pass over the corpus (`similarity.py
    semantic_contamination`)."""
    # spread (byte-gated): the corpus-side GEMM otherwise runs at the
    # single-row-group file's 1-task scan parallelism
    emb = load_spread(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    evalset = emb.where(F.col("vec_id") % 10 == 3)
    return similarity.semantic_contamination(
        emb, evalset, threshold=0.45, method="broadcast")


def _embedding_dedup_pipeline_fn(spark, sf_dir):
    """Embedding near-dup pairs -> connected components -> survivors: the
    same end-to-end shape as dedup_pipeline_minhash with cosine pairs as
    the candidate generator."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    pairs = similarity.embedding_dup_pairs(emb, threshold=0.45)
    return dedup.apply_dedup(emb, pairs, id_col="vec_id").select("vec_id")


def _group_cap_fn(spark, sf_dir):
    """Per-language document cap (corpus balancing): at most 20 docs per
    lang, chosen by deterministic md5 rank. No spread: the rank window's
    group exchange is the first operation and WindowGroupLimit prunes
    below the cap before it — an extra round-robin pass loses at sf0.1
    AND sf1 (0.35 s vs 0.50 s) and costs the single-exchange plan."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.per_group_cap(
        docs, ["lang"], n=20, id_col="doc_id", salt="cap"
    ).select("lang", "doc_id")


def _multimodal_png_fn(spark, sf_dir):
    """REAL compressed-image decode end-to-end: deterministic gradient
    PNGs (stdlib-zlib encode, per-row filter rotation — every PNG filter
    type in the corpus) → Arrow-batched pixel decode → width/height/
    per-channel means. The fixture's closed-form features are what the
    SQL oracle recomputes, so the decode itself is value-gated."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthesize_png_payloads(docs)
    return multimodal.decode_image_features(payloads)


def _multimodal_jpeg_fn(spark, sf_dir):
    """REAL baseline-JPEG decode end-to-end: deterministic 4:2:0
    3-component JPEGs whose constant 8x8 luma tiles + DC-quant-8 +
    constant-128 chroma round-trip BIT-EXACTLY through the lossy format
    (see synthesize_jpeg_payloads for the argument) → Arrow-batched
    Huffman/IDCT decode → width/height/per-channel means. The SQL
    oracle recomputes the closed-form tile means, value-gating the
    whole marker/Huffman/dequant/IDCT/upsample/YCbCr path."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthesize_jpeg_payloads(docs)
    return multimodal.decode_image_features(payloads)


def _multimodal_wav_fn(spark, sf_dir):
    """REAL audio decode end-to-end: deterministic square-wave PCM WAVs
    (odd amplitudes — provably no 6dp rounding ties, see
    synthesize_wav_payloads) → Arrow-batched RIFF parse + sample
    features. rms = peak = amplitude exactly; the SQL oracle recomputes
    the closed forms."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthesize_wav_payloads(docs)
    return multimodal.decode_audio_features(payloads)


def _multimodal_y4m_fn(spark, sf_dir):
    """REAL video decode end-to-end (1-to-many frame explosion):
    deterministic constant-gray Y4M clips (gray → Cb=Cr=128 exactly
    under the JPEG matrix, so values survive YCbCr bit-for-bit) →
    Arrow-batched planar-YUV parse → per-frame pixel means. The SQL
    oracle restates the closed forms over a per-id frame series."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthesize_y4m_payloads(docs)
    return multimodal.decode_video_frames(payloads)


def _multimodal_spectral_fn(spark, sf_dir):
    """FFT stage end-to-end: pure period-4 tones whose DFT is a single
    line at bin n/4 — the oracle checks the transform put the energy
    exactly where the algebra says (see synthesize_tone_wav_payloads)."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.synthesize_tone_wav_payloads(docs)
    return multimodal.audio_spectral_features(payloads)


def _multimodal_fn(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.attach_binary_payload(docs)
    return multimodal.decode_features(payloads)


def _s5_denorm_join_fn(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer),
                    orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("sum_totalprice"))
    )


# --------------------------------------------------------------------------- #
# catalog

def _decontaminate_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: which training docs share 3-grams with a
    held-out eval slice (doc_id % 97 == 0)."""
    docs = load_table(spark, sf_dir, "documents")
    evalset = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return dedup.ngram_contamination(corpus, evalset, n=3,
                                      strategy="broadcast")


def _dedup_pipeline_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup pipeline: minhash-LSH candidate pairs -> connected
    components (large-star/small-star) -> survivor filter."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=8, n=3,
                                    threshold=0.5)
    return dedup.apply_dedup(docs, pairs).select("doc_id")


def _curation_pipeline_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data curation chain in one query: near-dup
    survivors ∩ quality ≥ 0.9 ∩ not contaminated vs the eval slice.
    All three stages are semi/anti joins against small id sets — AQE turns
    every one into a broadcast join at corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    evalset = docs.filter(F.col("doc_id") % 97 == 0)
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=8, n=3,
                                    threshold=0.5)
    survivors = dedup.apply_dedup(docs, pairs).select("doc_id")
    # The quality cut rides a SPREAD + tiny (id, quality) persist: filtered
    # directly, PushDownPredicates plants the whole tokenizer+regex quality
    # formula at the parquet scan (1-2 input splits — 2.6 s of the sf1-tier
    # run serialized there); the cache boundary pins evaluation above the
    # exchange, 16 bytes/doc of storage.
    par = spark.sparkContext.defaultParallelism
    good = dedup.bounded_persist(
        text.quality_score(corpus.repartition(par, F.col("doc_id")))
    ).filter(F.col("quality") >= 0.9).select("doc_id")
    contaminated = dedup.ngram_contamination(corpus, evalset, n=5,
                                          strategy="broadcast") \
        .select("doc_id")
    return (corpus.select("doc_id")
            .join(survivors, "doc_id", "left_semi")
            .join(good, "doc_id", "left_semi")
            .join(contaminated, "doc_id", "left_anti"))


# MinHash-LSH candidate pairs verified by true Jaccard — shared by the
# pair-level entry and the end-to-end pipeline oracle.
_MINHASH_PAIRS_SQL = "WITH g AS (" + _GRAMS_SQL + """),
based AS (SELECT doc_id, gr,
  list_transform(gr, s -> ('0x' || substr(md5(s), 1, 11))::BIGINT) AS bases
  FROM g WHERE len(gr) > 0),
sigs AS (SELECT doc_id, gr, [""" + ", ".join(
    f"list_aggregate(list_transform(bases, h -> ({a} * h + {b}) % "
    f"{dedup.MINHASH_MOD}), 'min')"
    for a, b in dedup.minhash_params(32)) + """] AS sig
  FROM based),
banded AS (SELECT doc_id, gr, b AS band,
  md5(b || '|' || array_to_string(sig[b*4+1 : b*4+4], '|')) AS bucket
  FROM sigs, unnest(range(0, 8)) t(b)),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
  AND a.doc_id < b.doc_id)
SELECT id_a, id_b,
  round(len(list_intersect(ga.gr, gb.gr))::DOUBLE /
        (len(ga.gr) + len(gb.gr) - len(list_intersect(ga.gr, gb.gr))), 6) AS jaccard
FROM cand JOIN g ga ON cand.id_a = ga.doc_id JOIN g gb ON cand.id_b = gb.doc_id
WHERE round(len(list_intersect(ga.gr, gb.gr))::DOUBLE /
            (len(ga.gr) + len(gb.gr) - len(list_intersect(ga.gr, gb.gr))), 6) >= 0.5
"""


# C4/Gopher-style heuristic quality score — shared by the per-doc entry and
# the curation pipeline oracle.
_QUALITY_SQL = """
WITH toks AS (""" + _TOKS_SQL + """),
feat AS (SELECT doc_id,
  len(list_intersect(tk, ['the','a','of','and','to','in','is','that','it','for'])) AS stop_hits,
  len(tk) AS n_tokens, length(text) AS n_chars,
  (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE / greatest(length(text), 1) AS punct_ratio,
  (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / greatest(length(text), 1) AS digit_ratio
  FROM toks)
SELECT doc_id, greatest(least(round(
  (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.4 ELSE 0.1 END)
  + (CASE WHEN stop_hits >= 2 THEN 0.3 WHEN stop_hits = 1 THEN 0.15 ELSE 0.0 END)
  + 0.3 - round(punct_ratio * 0.5 + digit_ratio * 0.5, 6), 6), 1.0), 0.0) AS quality
FROM feat
"""


# Brute-force cosine top-k over the embeddings table: the oracle for the
# exact scorer AND for full-probe IVF (same rounding + vec_id tie-break).
_BRUTE_TOPK_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
scored AS (SELECT q.query_id, e.vec_id,
  round(list_dot_product(e.v, q.qv) /
        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine_sim
  FROM e, q WHERE e.vec_id <> q.query_id)
SELECT query_id, vec_id, cosine_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine_sim DESC, vec_id ASC) AS rn FROM scored)
WHERE rn <= 10
"""

# --------------------------------------------------------------------------- #
# round-3 additions: temperature resampling, deterministic k-means /
# SemDeDup, bloom decontamination, and three TPC-H subquery shapes


def _temperature_resample_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language mix after alpha=0.5 temperature downsampling — the
    head-language rebalance every multilingual corpus build applies."""
    docs = load_table(spark, sf_dir, "documents")
    kept = sampling.temperature_resample(docs, "lang", alpha=0.5)
    before = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    after = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))
    return (before.join(after, "lang", "left")
            .select("lang", "n_before",
                    F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept")))


# Dyadic mixture weights: wsum and every normalized target are exactly
# representable, so target/available and the md5-gate threshold are the
# SAME doubles in Spark and DuckDB — no rounding-boundary risk.
_MIXTURE_WEIGHTS = {"en": 0.5, "de": 0.25, "es": 0.125,
                    "fr": 0.0625, "zh": 0.0625}
_MIXTURE_TOTAL = 20_000


def _mixture_sample_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget domain mixing: plan per-language keep rates toward a
    20k-token corpus at the dyadic target mix, apply the deterministic
    gate, and report the audit frame (available/target/rate plus achieved
    docs+tokens per language)."""
    docs = load_table(spark, sf_dir, "documents")
    # ≤5-row audit frame persisted so plan + gate pay the corpus count
    # pass ONCE (the rates= passthrough added after the r7 regression)
    plan = sampling.mixture_plan(docs, _MIXTURE_WEIGHTS, "lang",
                                 _MIXTURE_TOTAL).persist()
    kept = sampling.mixture_sample(docs, _MIXTURE_WEIGHTS, "lang",
                                   _MIXTURE_TOTAL, rates=plan)
    toks = F.size(F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+"),
        lambda t: t != F.lit("")))
    after = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("kept_docs"),
        F.sum(toks).cast("long").alias("kept_tokens"))
    return (plan.join(after, "lang", "left")
            .select("lang", "available_tokens", "target_tokens", "rate",
                    F.coalesce(F.col("kept_docs"), F.lit(0)).cast("long")
                    .alias("kept_docs"),
                    F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("long")
                    .alias("kept_tokens")))


def _dsir_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scores for every document, target = the English
    slice: hashed-unigram log likelihood ratios (Laplace-smoothed,
    dyadically quantized) summed per doc. The quantization makes the
    per-doc sums exact and order-independent, so the oracle can aggregate
    in any order and still hash-match."""
    docs = load_spread(spark, sf_dir, "documents")
    return sampling.dsir_importance(docs, docs.where(F.col("lang") == "en"))


_DSIR_SQL = """
WITH toks AS (SELECT doc_id, lang,
    list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                x -> x <> '') AS tk
  FROM documents),
ex AS (SELECT doc_id, lang, unnest(tk) AS tok FROM toks),
bx AS (SELECT doc_id, lang,
    ('0x' || substr(md5(tok), 1, 11))::BIGINT % 1024 AS b FROM ex),
rb AS (SELECT b, count(*) AS c FROM bx GROUP BY 1),
tb AS (SELECT b, count(*) AS c FROM bx WHERE lang = 'en' GROUP BY 1),
tot AS (SELECT (SELECT count(*) FROM bx) AS rt,
               (SELECT count(*) FROM bx WHERE lang = 'en') AS tt),
lr AS (SELECT r.range AS b,
    round(ln(((coalesce(tb.c, 0) + 1.0) * (tot.rt + 1024.0)) /
             ((coalesce(rb.c, 0) + 1.0) * (tot.tt + 1024.0))) * 1048576)
      / 1048576 AS v
  FROM range(0, 1024) r CROSS JOIN tot
  LEFT JOIN rb ON r.range = rb.b LEFT JOIN tb ON r.range = tb.b),
sc AS (SELECT bx.doc_id, sum(lr.v) AS s, count(*) AS n
  FROM bx JOIN lr ON bx.b = lr.b GROUP BY 1)
SELECT t.doc_id, coalesce(sc.n, 0)::INT AS n_tokens,
  round(coalesce(sc.s, 0.0), 6) AS logw_sum,
  round(coalesce(sc.s, 0.0) / greatest(coalesce(sc.n, 1), 1), 6)
    AS logw_mean
FROM toks t LEFT JOIN sc ON t.doc_id = sc.doc_id
"""


_MIXTURE_UP_TOTAL = 60_000


def _mixture_upsample_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oversampling path: a 60k-token budget exceeds most languages'
    supply at sf0.01 (rates > 1 → real repetition via the exploded copy
    index) while staying under the head languages' supply at sf0.1
    (rates < 1 → plain gate) — both code paths exercised across the
    driver's scales. The audit aggregates the EXPLODED output, so copy
    multiplicity itself is value-checked."""
    docs = load_spread(spark, sf_dir, "documents")
    plan = sampling.mixture_plan(docs, _MIXTURE_WEIGHTS, "lang",
                                 _MIXTURE_UP_TOTAL, cap_rate=False).persist()
    kept = sampling.mixture_upsample(docs, _MIXTURE_WEIGHTS, "lang",
                                     _MIXTURE_UP_TOTAL, rates=plan)
    toks = F.size(F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+"),
        lambda t: t != F.lit("")))
    after = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("kept_units"),
        F.sum(toks).cast("long").alias("kept_tokens"),
        F.max("copy").cast("long").alias("max_copy"))
    return (plan.join(after, "lang", "left")
            .select("lang", "available_tokens",
                    F.round("rate", 6).alias("rate"),
                    F.coalesce(F.col("kept_units"), F.lit(0)).cast("long")
                    .alias("kept_units"),
                    F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("long")
                    .alias("kept_tokens"),
                    F.coalesce(F.col("max_copy"), F.lit(0)).cast("long")
                    .alias("max_copy")))


def _mixture_upsample_sql() -> str:
    targets = sampling._mixture_targets(_MIXTURE_WEIGHTS, _MIXTURE_UP_TOTAL)
    tgt_case = ("CASE " + " ".join(
        f"WHEN lang = '{s}' THEN CAST({t!r} AS DOUBLE)"
        for s, t in targets.items()) + " ELSE 0.0 END")
    langs = ", ".join(f"'{s}'" for s in targets)
    # n_copies = floor(rate) + (md5 gate on the fractional part); the
    # audit needs no unnest — units and tokens scale by n_copies
    return f"""
WITH d AS (SELECT doc_id, lang,
    len(list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
        x -> x <> '')) AS nt
  FROM documents WHERE lang IN ({langs})),
c AS (SELECT lang, sum(nt)::BIGINT AS available_tokens FROM d GROUP BY 1),
p AS (SELECT lang, available_tokens,
    ({tgt_case}) / available_tokens::DOUBLE AS rate FROM c),
n AS (SELECT d.lang, d.nt,
    (floor(p.rate)::BIGINT + CASE WHEN
        ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 11))::BIGINT <
        floor((p.rate - floor(p.rate)) * 17592186044416)
      THEN 1 ELSE 0 END) AS n_copies
  FROM d JOIN p ON d.lang = p.lang),
k AS (SELECT lang, sum(n_copies)::BIGINT AS kept_units,
        sum(n_copies * nt)::BIGINT AS kept_tokens,
        max(n_copies)::BIGINT AS max_copy
  FROM n WHERE n_copies > 0 GROUP BY 1)
SELECT p.lang, p.available_tokens, round(p.rate, 6) AS rate,
  coalesce(k.kept_units, 0)::BIGINT AS kept_units,
  coalesce(k.kept_tokens, 0)::BIGINT AS kept_tokens,
  coalesce(k.max_copy, 0)::BIGINT AS max_copy
FROM p LEFT JOIN k ON p.lang = k.lang
"""


def _mixture_sql() -> str:
    targets = sampling._mixture_targets(_MIXTURE_WEIGHTS, _MIXTURE_TOTAL)
    tgt_case = ("CASE " + " ".join(
        f"WHEN lang = '{s}' THEN CAST({t!r} AS DOUBLE)"
        for s, t in targets.items()) + " ELSE 0.0 END")
    langs = ", ".join(f"'{s}'" for s in targets)
    return f"""
WITH d AS (SELECT doc_id, lang,
    len(list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
        x -> x <> '')) AS nt
  FROM documents WHERE lang IN ({langs})),
c AS (SELECT lang, sum(nt)::BIGINT AS available_tokens FROM d GROUP BY 1),
p AS (SELECT lang, available_tokens,
    round({tgt_case}, 6) AS target_tokens,
    least(1.0, ({tgt_case}) / available_tokens::DOUBLE) AS rate
  FROM c),
k AS (SELECT d.lang, count(*)::BIGINT AS kept_docs,
        sum(d.nt)::BIGINT AS kept_tokens
  FROM d JOIN p ON d.lang = p.lang
  WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 11))::BIGINT <
        floor(p.rate * 17592186044416)
  GROUP BY 1)
SELECT p.lang, p.available_tokens, p.target_tokens, p.rate,
  coalesce(k.kept_docs, 0)::BIGINT AS kept_docs,
  coalesce(k.kept_tokens, 0)::BIGINT AS kept_tokens
FROM p LEFT JOIN k ON p.lang = k.lang
"""


def _kmeans_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 2-round Lloyd's k-means over the embeddings table:
    (cluster, n_members, centroid_norm). Every step — seeded init,
    max-cosine assignment, rounded per-dim means — is reproduced by the
    chained-CTE oracle, so the ITERATION is differential-tested, not just
    the final shape."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centers = similarity.kmeans_lloyd(emb, k=8, rounds=2)
    norms = [(i, similarity._round6(sum(x * x for x in c) ** 0.5))
             for i, c in enumerate(centers)]
    ndf = spark.createDataFrame(norms, "cluster int, centroid_norm double")
    return (assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_members"))
            .join(F.broadcast(ndf), "cluster")
            .select(F.col("cluster").cast("int").alias("cluster"),
                    "n_members", "centroid_norm"))


def _semantic_dedup_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup_pairs(emb, k=8, rounds=2, threshold=0.45)


def _bloom_decontaminate_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as decontaminate_ngram (the bloom prefilter admits no
    false negatives; the exact join removes its false positives) — the
    oracle is therefore the exact-contamination SQL."""
    docs = load_table(spark, sf_dir, "documents")
    evalset = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return dedup.bloom_contamination(corpus, evalset, n=3)


def _kmeans_cte_sql(k: int = 8, rounds: int = 2) -> str:
    """WITH-clause body reproducing similarity.kmeans_lloyd exactly:
    seeds = embeddings of the k lowest vec_ids; each round assigns every
    vector to its max-cosine center (ties to the lowest center index) and
    recomputes 6-decimal-rounded per-dim means. Exposes ``af`` (final
    assignment: vec_id, v, ci) and ``c{rounds}`` (final centers)."""
    def assign(name: str, centers: str) -> str:
        return f"""{name} AS (SELECT vec_id, v, ci FROM (
  SELECT e.vec_id, e.v, c.ci,
    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      list_dot_product(e.v, c.v) /
      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.v, c.v))) DESC,
      c.ci ASC) AS rk
  FROM e CROSS JOIN {centers} c) WHERE rk = 1)"""

    def means(name: str, src: str) -> str:
        return f"""{name} AS (SELECT ci, list(m ORDER BY dim) AS v FROM (
  SELECT ci, dim, round(avg(val), 6) AS m FROM (
    SELECT ci, unnest(v) AS val, generate_subscripts(v, 1) AS dim FROM {src})
  GROUP BY ci, dim) GROUP BY ci)"""

    parts = [
        """e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE embedding IS NOT NULL
    AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0)""",
        f"""c0 AS (SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS ci, v
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k}))""",
    ]
    for r in range(1, rounds + 1):
        parts.append(assign(f"a{r}", f"c{r - 1}"))
        parts.append(means(f"c{r}", f"a{r}"))
    parts.append(assign("af", f"c{rounds}"))
    return ",\n".join(parts)


def _top_supplier_per_part_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-flavored correlated max: for each (filtered) part, the supplier
    that shipped the most units. The part-key filter is applied BEFORE the
    aggregate so it pushes to the lineitem scan; the correlated subquery
    becomes one rank window over the (partkey, suppkey) partial aggregate —
    no re-join against lineitem. Dimension joins broadcast."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_partkey") <= 100)
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    from pyspark.sql import Window

    ps = (li.groupBy("l_partkey", "l_suppkey")
          .agg(F.sum("l_quantity").alias("top_qty")))
    w = Window.partitionBy("l_partkey").orderBy(F.desc("top_qty"),
                                                F.asc("l_suppkey"))
    top = ps.withColumn("__rk", F.row_number().over(w)).where(F.col("__rk") == 1)
    return (top.join(F.broadcast(part),
                     top.l_partkey == part.p_partkey)
            .join(F.broadcast(supp), top.l_suppkey == supp.s_suppkey)
            .select("p_partkey", "p_name", "s_name", "top_qty"))


def _pending_supply_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-flavored nested semi-join chain: suppliers that shipped > 100
    units of red parts in 1996-97. The part subset broadcasts into the
    lineitem scan (semi shape), the per-supplier aggregate is the only
    exchange, and both dimension lookups broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    gp = part.where(F.col("p_name").like("red%")).select("p_partkey")
    sq = (li.where((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                   & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
          .join(F.broadcast(gp), F.col("l_partkey") == F.col("p_partkey"))
          .groupBy("l_suppkey").agg(F.sum("l_quantity").alias("red_qty"))
          .where(F.col("red_qty") > 100))
    return (sq.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_name", "n_name", "red_qty"))


_LATE_NS = 31_536_000 * 10**9  # 365 days


def _late_orders_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-flavored exists / not-exists: suppliers who were the ONLY late
    shipper on a multi-supplier order. The textbook formulation is two
    correlated subqueries (EXISTS other-supplier line, NOT EXISTS
    other-supplier LATE line) — each a re-join against lineitem. Here both
    collapse into per-order counters over the (orderkey, suppkey) flag
    aggregate — computed as a WINDOW on the aggregate, not a groupBy +
    self-join, so the flag frame is built once (a groupBy formulation
    duplicates the whole lineitem⨝orders subtree into both join sides and
    adds a sort-merge join; the window reuses the aggregate's own
    exchange). Late-supplier rows qualify iff n_supp > 1 AND n_late = 1.
    Per-order windows are bounded by suppliers-per-order — no skew risk."""
    from pyspark.sql import Window

    li = ts_ns(load_table(spark, sf_dir, "lineitem"), "l_shipdate")
    orders = ts_ns(load_table(spark, sf_dir, "orders"), "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier")
    lo = (li.select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(orders.select("o_orderkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey")))
    # ONE exchange serves both the flag aggregate and the per-order
    # window: project the per-row late flag first (3 narrow columns),
    # hash-repartition by l_orderkey (hash on a key subset satisfies the
    # groupBy(l_orderkey, l_suppkey) clustering, and the window's), and
    # aggregate in place. The groupBy-first form paid a second full
    # exchange of the flag frame for the window; map-side partial
    # aggregation bought almost nothing here ((orderkey, suppkey) is
    # nearly distinct per line), so shuffling the pre-projected rows
    # costs the same bytes. AQE still right-sizes the single exchange.
    row_late = (F.when(F.col("l_shipdate") - F.col("o_orderdate")
                       > F.lit(_LATE_NS), 1).otherwise(0))
    flag = (lo.select("l_orderkey", "l_suppkey",
                      row_late.alias("__row_late"))
            .repartition(F.col("l_orderkey"))
            .groupBy("l_orderkey", "l_suppkey")
            .agg(F.max("__row_late").alias("late")))
    w = Window.partitionBy("l_orderkey")
    per_order = (flag.withColumn("n_supp", F.count(F.lit(1)).over(w))
                 .withColumn("n_late", F.sum("late").over(w)))
    return (per_order
            .where((F.col("late") == 1) & (F.col("n_supp") > 1)
                   & (F.col("n_late") == 1))
            .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), F.asc("s_name")).limit(20))


def _exact_substring_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    return text.exact_substring_spans(docs, window=20)


def _sales_opportunity_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-flavored anti-join + scalar subquery: per nation, the customers
    with above-average balance and no RECENT order (none since 2000 — the
    synthetic data gives every customer some order, like real tenured
    books). The average is a 1-row broadcast; the NOT EXISTS is a shuffle
    anti-join on custkey whose orders side is date-pruned AT THE SCAN;
    nation broadcasts. Balance totals are summed in exact integer cents so
    partial-agg order can't move the rounded sum."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nat = load_table(spark, sf_dir, "nation")
    avg_bal = (cust.where(F.col("c_acctbal") > 0)
               .agg(F.avg("c_acctbal").alias("ab")))
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    idle = cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
    return (idle.crossJoin(F.broadcast(avg_bal))
            .where(F.col("c_acctbal") > F.col("ab"))
            .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n_custs"),
                 F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
                 .alias("total_bal_cents")))


_INCR_INDEX_DIRS: dict = {}


def _incremental_lsh_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest dedup shape: the doc_id %% 5 == 0 slice arrives as a new
    batch; everything else is the already-indexed corpus. Produces exactly
    the full run's pairs that touch >= 1 new doc — the corpus x corpus work
    is never recomputed, and corpus text is re-shingled only for matched
    candidate ids.

    Production persists the band-table index once and amortizes it across
    every ingest; the bench mirrors that by round-tripping the index
    through parquet on the FIRST call per dataset (so of bench.py's 3
    timed runs, runs 2-3 pay only the increment — through round 3 every
    run re-built the 80%-corpus index in-query, which is what the 4.27 s
    r3 bench number was mostly measuring).

    Steady-state cost decomposition (idle box, r5): the min-of-3 bench
    number IS the steady state — runs were 9.7/3.4/3.5/3.2 s, so the
    build run never wins the min. Of the ~3.3 s increment: shingle 0.16,
    minhash 0.19, banding 0.26, candidate join ~1.4, verify ~1.5 — at
    sf0.1's 5,000 documents this is per-stage scheduling latency
    (~15 tiny stages), not plan cost. The scale-relevant number is the
    2M-doc rung: 15.5 s for a 10% batch — 400× the data for 4.5× the
    time, i.e. the fixed overhead amortizes exactly as an ingest job
    should."""
    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    old = docs.filter(F.col("doc_id") % 5 != 0)
    path = _INCR_INDEX_DIRS.get(sf_dir)
    if path is None:
        import tempfile

        path = tempfile.mkdtemp(prefix="frs_incr_band_index_")
        (dedup.minhash_band_table(old, num_hashes=32, bands=8, n=3)
         .write.mode("overwrite").parquet(path))
        _INCR_INDEX_DIRS[sf_dir] = path
    index = spark.read.parquet(path)
    return dedup.incremental_lsh_pairs(new, old, index=index,
                                       num_hashes=32, bands=8, n=3,
                                       threshold=0.5)


def _curation_report_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation dashboard — the triage view a corpus build
    inspects before choosing mixing weights: doc counts, mean quality,
    near-duplicate docs, and contaminated docs per source/domain. Flags
    come from the same operators the pipeline applies (one pair pass, one
    quality projection, one contamination join); the rollup itself is a
    single groupBy(source)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    evalset = docs.filter(F.col("doc_id") % 97 == 0)
    # dup_ids consumes `pairs` TWICE (id_a + id_b selects); the differing
    # pushed projections make the two subtrees non-reusable exchanges, so
    # without a persist the verify join runs twice. The pairs OUTPUT is
    # tiny (bounded by true near-dups) — persist it, not the internals.
    pairs = dedup.bounded_persist(
        dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=8, n=3,
                                threshold=0.5))
    dup_ids = (pairs.select(F.col("id_a").alias("doc_id"))
               .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
               .distinct().withColumn("__dup", F.lit(1)))
    cont_ids = (dedup.ngram_contamination(corpus, evalset, n=5,
                                          strategy="broadcast")
                .select("doc_id").withColumn("__cont", F.lit(1)))
    # spread below the quality projection: the formula otherwise evaluates
    # in the scan stage at the file's 1-2-split parallelism (no filter here,
    # so no persist barrier is needed — just the exchange placement)
    base = (corpus.select("doc_id", "source")
            .join(text.quality_score(
                corpus.repartition(
                    spark.sparkContext.defaultParallelism,
                    F.col("doc_id"))), "doc_id")
            .join(dup_ids, "doc_id", "left")
            .join(cont_ids, "doc_id", "left"))
    # quality is 6-dp-rounded, so sum it as EXACT integer micro-units and
    # derive the mean from (int, int) — a float avg's accumulation order
    # can flip the rounded 4th decimal between engines (observed at sf0.01)
    return (base.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.round(F.col("quality") * 1e6).cast("long"))
                 .alias("__q"),
                 F.sum(F.coalesce(F.col("__dup"), F.lit(0)))
                 .alias("n_near_dup"),
                 F.sum(F.coalesce(F.col("__cont"), F.lit(0)))
                 .alias("n_contaminated"))
            .select("source", "n_docs",
                    F.round(F.col("__q") / F.col("n_docs") / F.lit(1e6), 4)
                    .alias("mean_quality"),
                    "n_near_dup", "n_contaminated"))


def _interval_join_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrency analysis: which sessions of the 20 most active users
    overlap in wall-clock time. Exercises the interval-overlap join's
    bucketed (big x big) strategy: both session sets explode to day-grid
    cells, equi-join on the cell, and each overlapping pair is attributed
    to exactly ONE cell (the overlap-start cell) so no distinct pass is
    needed. End bounds are exclusive (last event + 1 ns)."""
    ev = ts_ns(load_table(spark, sf_dir, "events"))
    top = (ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("__n"))
           .orderBy(F.desc("__n"), F.asc("user_id")).limit(20)
           .select("user_id"))
    sess = temporal.session_stats(
        ev.join(F.broadcast(top), "user_id").select("user_id", "ts"),
        "user_id", "ts", gap=NANOS_2H)
    s = sess.select("user_id", "session_id",
                    F.col("start_ts").alias("sa"),
                    (F.col("end_ts") + F.lit(1)).alias("ea"))
    left = s.select(F.col("user_id").alias("user_a"),
                    F.col("session_id").alias("session_a"),
                    "sa", "ea")
    right = s.select(F.col("user_id").alias("user_b"),
                     F.col("session_id").alias("session_b"),
                     F.col("sa").alias("sb"), F.col("ea").alias("eb"))
    j = temporal.interval_join(left, right, "sa", "ea", "sb", "eb",
                               bucket_size=float(NANOS_DAY),
                               strategy="bucketed")
    return (j.where(F.col("user_a") < F.col("user_b"))
            .select("user_a", "session_a", "user_b", "session_b",
                    F.expr("(least(ea, eb) - greatest(sa, sb)) DIV 1000")
                    .alias("overlap_us")))


def _remove_dup_spans_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    return text.remove_duplicate_spans(docs, window=20)


def _heavy_hitters_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return skew.heavy_hitters(ev, "props", k=10, counters=512)


def _sample_splits_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test mix per language after deterministic 90/5/5 split
    assignment — the artifact audit every dataset release runs."""
    docs = load_spread(spark, sf_dir, "documents")
    split = sampling.assign_split(
        docs, {"train": 0.9, "val": 0.05, "test": 0.05})
    return (split.groupBy("lang", "split")
            .agg(F.count(F.lit(1)).alias("n_docs")))


def _classifier_score_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_spread(spark, sf_dir, "documents")
    return text.classifier_score(docs)


def _trained_weights() -> dict:
    """Deterministic 'trained' vocabulary over the synthetic corpus's
    actual word set. Weights are DYADIC rationals (multiples of 2^-10) so
    every partial sum is exactly representable in a double: the broadcast
    join's arbitrary aggregation order and DuckDB's both land on the SAME
    sum bit-for-bit — the float analogue of the integer-cents trick the
    money oracles use."""
    import hashlib

    vocab = ["a", "agg", "batch", "big", "column", "customer", "data",
             "dup", "fast", "filter", "group", "hash", "join", "key",
             "line", "merge", "order", "part", "query", "row", "scan",
             "slow", "small", "sort", "spark", "stream", "table", "the",
             "value", "vector", "window"]
    return {w: ((int(hashlib.md5(f"tw:{w}".encode()).hexdigest()[:8], 16)
                 % 2049) - 1024) / 1024.0
            for w in vocab}


def _classifier_trained_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-weight classifier gate. auto resolves to the literal-map
    strategy — what a production caller with a 31-word gate vocabulary
    gets; the broadcast-join twin (the 100k-vocabulary shape) is
    equality- and plan-pinned in pytest."""
    docs = load_spread(spark, sf_dir, "documents")
    return text.classifier_score_weights(docs, _trained_weights())


def _trained_weights_sql() -> str:
    rows = ", ".join(f"('{t}', CAST({w!r} AS DOUBLE))"
                     for t, w in sorted(_trained_weights().items()))
    return f"""
WITH toks AS ({_TOKS_SQL}),
w(token, weight) AS (VALUES {rows}),
ex AS (SELECT doc_id, len(tk) AS n, unnest(tk) AS tok FROM toks),
j AS (SELECT e.doc_id, e.n, coalesce(w.weight, 0.0) AS wt
      FROM ex e LEFT JOIN w ON e.tok = w.token),
agg AS (SELECT doc_id, max(n) AS n, sum(wt) AS s FROM j GROUP BY 1)
SELECT t.doc_id,
  round(1.0 / (1.0 + exp(-(coalesce(a.s, 0.0)
        / greatest(coalesce(a.n, 1), 1)))), 6) AS clf_score
FROM toks t LEFT JOIN agg a USING (doc_id)
"""


def _gopher_filter_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-set filter (Rae et al. 2021 A1.1) over the corpus —
    published thresholds except min_words=20 (the synthetic docs run
    8-110 words) and min_stopword_hits=1 (the synthetic vocabulary carries
    only 'the' from the required-stopword list)."""
    docs = load_spread(spark, sf_dir, "documents")
    return text.gopher_quality_filter(docs, min_words=20,
                                      min_stopword_hits=1)


def _c4_clean_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning; terminal-punctuation rule off because the
    synthetic corpus has no punctuation (the rule itself is pinned in
    pytest on crafted docs) — variance comes from the ≥12-words rule."""
    docs = load_spread(spark, sf_dir, "documents")
    return text.c4_line_filter(docs, min_words_per_line=12,
                               require_terminal_punct=False)


# Pluggable BPE merge table for text_tokens_bpe: produced ONCE by the
# in-engine trainer (text.learn_bpe(documents@sf0.001, n_merges=24,
# min_count=2)) and pinned here so the catalog query and its oracle embed
# the SAME literal table — the operator contract is "apply THIS table
# exactly", which is what a user does with a published tokenizer's
# merges.txt. Greedy ranks reflect the synthetic corpus (scan/column/
# window/order/sort all fully merge).
_BPE_MERGES = [
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
    ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("d", "ow"), ("in", "dow"),
    ("w", "indow"), ("d", "er"), ("or", "der"), ("or", "t"),
    ("s", "ort"),
]


def _bpe_tokens_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact merge-table BPE (Sennrich et al. 2016 sequential-replace
    semantics) over the corpus with the pinned 24-merge table — the
    expression path: char-split + aggregate() fold over a literal merge
    array inside transform(), pure whole-stage codegen, zero shuffle.
    The oracle replays the same table as nested replace() calls."""
    docs = load_spread(spark, sf_dir, "documents")
    return text.bpe_tokenize(docs, _BPE_MERGES)


def _lm_nll_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020): train the
    hashed bigram LM on the 'en' slice (the high-quality target, DSIR's
    convention), score EVERY document's avg negative log-likelihood —
    the perplexity signal LLaMA-style pipelines filter on. Training
    collects ≤256 unigram + ≤1024 top-bigram rows; scoring is a
    zero-shuffle literal-map projection. Dyadic-quantized log-probs make
    every value exact cross-engine."""
    docs = load_spread(spark, sf_dir, "documents")
    return text.lm_nll(docs, docs.where(F.col("lang") == "en"))


def _lm_nll_sql(nb: int, tb: int) -> str:
    """CCNet-LM oracle, parameterized by (n_buckets, top_bigrams) so the
    same replay covers both the literal-map catalog query (256/1024) and
    the broadcast-join variant's bigger model."""
    return f"""
WITH toks AS (SELECT doc_id, lang,
    list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                x -> x <> '') AS tk
  FROM documents),
ba AS (SELECT doc_id, lang,
    list_transform(tk, t -> ('0x' || substr(md5(t), 1, 11))::BIGINT % {nb})
      AS bs
  FROM toks),
ub AS (SELECT unnest(bs) AS b FROM ba WHERE lang = 'en'),
uc AS (SELECT b, count(*) AS c FROM ub GROUP BY 1),
ut AS (SELECT count(*) AS t FROM ub),
ul AS MATERIALIZED (SELECT r.range AS b,
    round(ln((coalesce(uc.c, 0) + 1.0) / (ut.t + {nb}.0)) * 1048576)
      / 1048576 AS v
  FROM range(0, {nb}) r CROSS JOIN ut LEFT JOIN uc ON r.range = uc.b),
bg AS (SELECT unnest(list_transform(generate_series(1, len(bs) - 1),
        i -> bs[i] * {nb} + bs[i + 1])) AS pc
  FROM ba WHERE lang = 'en'),
bc AS (SELECT pc, count(*) AS c FROM bg GROUP BY 1),
topb AS (SELECT pc, c FROM bc ORDER BY c DESC, pc ASC LIMIT {tb}),
bl AS MATERIALIZED (SELECT t.pc,
    round(ln((t.c + 1.0) / (coalesce(uc.c, 0) + {nb}.0)) * 1048576)
      / 1048576 AS v
  FROM topb t LEFT JOIN uc ON t.pc // {nb} = uc.b),
pairs AS (SELECT doc_id,
    unnest(list_transform(generate_series(1, len(bs) - 1),
        i -> bs[i] * {nb} + bs[i + 1])) AS pc
  FROM ba),
ps AS (SELECT pairs.doc_id,
    sum(coalesce(bl.v, round(ln(0.4) * 1048576) / 1048576 + ulc.v)) AS s
  FROM pairs LEFT JOIN bl ON pairs.pc = bl.pc
  JOIN ul ulc ON pairs.pc % {nb} = ulc.b
  GROUP BY 1),
fs AS (SELECT ba.doc_id, len(bs) AS n,
    CASE WHEN len(bs) > 0 THEN (SELECT v FROM ul WHERE ul.b = bs[1])
         ELSE 0.0 END AS f
  FROM ba)
SELECT fs.doc_id, fs.n::INT AS n_tokens,
  round(fs.f + coalesce(ps.s, 0.0), 6) AS logprob_sum,
  round(-(fs.f + coalesce(ps.s, 0.0)) / greatest(fs.n, 1), 6) AS avg_nll
FROM fs LEFT JOIN ps ON fs.doc_id = ps.doc_id
"""


_LM_NLL_SQL = _lm_nll_sql(256, 1024)

# Join-scorer variant: a model past BOTH literal-map caps (4096 buckets,
# up to 100k bigrams), so lm_score's auto routing provably takes the
# broadcast-join path in the driver-checked query.
_LM_JOIN_NB, _LM_JOIN_TB = 4096, 100_000


def _lm_nll_join_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet LM scoring THROUGH the broadcast-join path: same semantics
    as text_lm_nll but with a 4096-bucket / 100k-bigram model — beyond
    the literal-map caps, so strategy='auto' routes to the join scorer
    (exploded pair keys → broadcast model frames → per-doc re-aggregate,
    shuffle volume ~1 row/doc after partial aggregation)."""
    docs = load_spread(spark, sf_dir, "documents")
    return text.lm_nll(docs, docs.where(F.col("lang") == "en"),
                       n_buckets=_LM_JOIN_NB, top_bigrams=_LM_JOIN_TB)


# Frames-native variant: the model is TRAINED as DataFrames (uni/bi
# tables never touch the driver) — distinct params so all three LM
# catalog queries exercise distinct (trainer, scorer) pairs.
_LM_FRAMES_NB, _LM_FRAMES_TB = 2048, 50_000


def _lm_nll_frames_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet LM scoring with FRAMES-NATIVE training: lm_bigram_model_frames
    builds the unigram/bigram tables as localCheckpointed DataFrames (two
    vocabulary-bounded aggregates, zero driver collect), and lm_score
    broadcast-joins them against the exploded corpus pairs. The shape that
    carries a model past any driver bound — same oracle replay as the
    other LM variants at (2048, 50k)."""
    docs = load_spread(spark, sf_dir, "documents")
    return text.lm_nll(docs, docs.where(F.col("lang") == "en"),
                       n_buckets=_LM_FRAMES_NB, top_bigrams=_LM_FRAMES_TB,
                       frames=True)


_BPE_LEARN_N = 6  # merges the in-engine trainer learns for the oracle query


def _bpe_learned_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-ENGINE BPE training exposed as a catalog query: learn 6 merges
    from the corpus (greedy most-frequent-pair, lexicographic tie-break,
    min_count=2) and emit the ordered merge table. The oracle replays the
    ENTIRE training trajectory in SQL — one chained CTE per iteration
    computing weighted pair counts, taking the same argmax with the same
    tie-break, and folding the merge into the word-frequency state — the
    perceptron-oracle pattern applied to tokenizer training. Early-stop
    padding: if training exhausts qualifying pairs, remaining ranks are
    ('','') on both sides."""
    docs = load_spread(spark, sf_dir, "documents")
    merges = text.learn_bpe(docs, _BPE_LEARN_N, min_count=2)
    merges = (merges + [("", "")] * _BPE_LEARN_N)[:_BPE_LEARN_N]
    rows = [(i + 1, a, b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "merge_rank int, left_sym string, right_sym string")


def _bpe_learn_oracle_sql(n_merges: int, min_count: int = 2) -> str:
    """Chained-CTE replay of greedy BPE training: w{i} is the word-freq
    symbol state after merge i, p{i} the weighted adjacent-pair counts
    over w{i-1}, b{i} the argmax pair (count desc, pair asc, floor
    min_count). Exact — both engines fold integer counts. Every CTE is
    MATERIALIZED: each w{i} references b{i} via three scalar subqueries,
    so inlined CTEs would re-evaluate the whole chain exponentially."""
    ctes = ["""w0 AS MATERIALIZED (
  SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'gs')) AS sym,
         count(*)::BIGINT AS n
  FROM (SELECT unnest(list_filter(
          string_split_regex(coalesce(text, ''), '\\s+'),
          x -> x <> '')) AS w FROM documents)
  GROUP BY 1)"""]
    for i in range(1, n_merges + 1):
        prev = f"w{i - 1}"
        ctes.append(f"""p{i} AS MATERIALIZED (
  SELECT pr, sum(n) AS c FROM (
    SELECT unnest(list_transform(
      generate_series(1, len(string_split(sym, ' ')) - 1),
      k -> string_split(sym, ' ')[k] || ' ' || string_split(sym, ' ')[k + 1]
      )) AS pr, n
    FROM {prev}) GROUP BY pr),
b{i} AS MATERIALIZED (SELECT pr FROM p{i} WHERE c >= {min_count}
         ORDER BY c DESC, pr ASC LIMIT 1),
w{i} AS MATERIALIZED (SELECT CASE WHEN (SELECT count(*) FROM b{i}) = 1
    THEN replace(sym, (SELECT pr FROM b{i}),
                 replace((SELECT pr FROM b{i}), ' ', ''))
    ELSE sym END AS sym, n FROM {prev})""")
    selects = "\nUNION ALL\n".join(
        f"SELECT {i} AS merge_rank, "
        f"coalesce((SELECT string_split(pr, ' ')[1] FROM b{i}), '') "
        f"AS left_sym, "
        f"coalesce((SELECT string_split(pr, ' ')[2] FROM b{i}), '') "
        f"AS right_sym"
        for i in range(1, n_merges + 1))
    return ("WITH " + ",\n".join(ctes) + "\n" + selects
            + "\nORDER BY merge_rank")


def _bpe_oracle_sql(merges: list) -> str:
    def q(x: str) -> str:  # SQL string literal escaping for merge symbols
        return x.replace("'", "''")

    expr = "trim(regexp_replace(w, '(.)', '\\1 ', 'gs'))"
    for a, b in merges:
        expr = f"replace({expr}, '{q(a)} {q(b)}', '{q(a)}{q(b)}')"
    return f"""
WITH d AS (SELECT doc_id,
  list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
              x -> x <> '') AS words
  FROM documents),
enc AS (SELECT doc_id, list_transform(words, w -> {expr}) AS syms FROM d)
SELECT doc_id,
  coalesce(list_sum(list_transform(syms, s -> len(string_split(s, ' ')))),
           0)::INT AS n_bpe_tokens,
  array_to_string(syms, ' ') AS bpe_text
FROM enc
"""


_PERCEPTRON_VOCAB = ["data", "fast", "join", "query", "scan", "slow",
                     "spark", "table"]
_PERCEPTRON_ITERS = 3


def _train_perceptron_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-ENGINE classifier training: 3 batch-perceptron iterations over
    binary bag-of-words features, label = doc contains 'spark'. Dyadic
    lr=0.5 keeps the whole trajectory exactly representable, so the
    chained-CTE oracle replays training bit-for-bit (the kmeans_lloyd
    pattern applied to supervised learning). Output rows: one (token,
    weight) per vocab term + __bias__, plus __mistakes_i audit rows —
    if training converges early the remaining iterations are provably
    no-ops (zero mistakes, zero updates), so padding with 0 is exact.

    Spread: with the feature frame persisted (r12), the one-time
    tokenize+intersect job parallelizes into the cache and every
    iteration reads spread partitions — measured 0.77 s → 0.66 s at
    sf0.1 (pre-persist, the spread lost: it re-paid the exchange on
    every iteration's re-scan)."""
    docs = load_spread(spark, sf_dir, "documents")
    label = F.array_contains(
        F.split(F.lower(F.col("text")), r"\s+"), "spark")
    w, m = text.train_classifier_perceptron(
        docs, label, _PERCEPTRON_VOCAB, iterations=_PERCEPTRON_ITERS)
    m = (m + [0] * _PERCEPTRON_ITERS)[:_PERCEPTRON_ITERS]
    rows = sorted(w.items()) + [
        (f"__mistakes_{i + 1}", float(c)) for i, c in enumerate(m)]
    return spark.createDataFrame(rows, "token string, weight double")


def _perceptron_sql() -> str:
    vocab = ", ".join(f"'{t}'" for t in _PERCEPTRON_VOCAB)
    vrows = ", ".join(f"('{t}')" for t in ["__bias__"] + _PERCEPTRON_VOCAB)
    return f"""
WITH toks AS (SELECT doc_id, list_filter(string_split_regex(
    lower(coalesce(text, '')), '\\s+'), x -> x <> '') AS tk FROM documents),
docs AS (SELECT doc_id,
    list_append(list_intersect(list_distinct(tk), [{vocab}]),
                '__bias__') AS ft,
    CASE WHEN list_contains(tk, 'spark') THEN 1 ELSE 0 END AS y FROM toks),
ex AS (SELECT doc_id, y, unnest(ft) AS tok FROM docs),
g1 AS (SELECT tok, 0.5 * count(*) AS dw FROM ex WHERE y = 1 GROUP BY tok),
n1 AS (SELECT count(*) AS m FROM docs WHERE y = 1),
m2 AS (SELECT e.doc_id, max(e.y) AS y, sum(coalesce(g1.dw, 0)) AS marg
       FROM ex e LEFT JOIN g1 ON e.tok = g1.tok GROUP BY e.doc_id),
d2 AS (SELECT doc_id, y, CASE WHEN marg > 0 THEN 1 ELSE 0 END AS yhat
       FROM m2),
g2 AS (SELECT e.tok, 0.5 * sum(d.y - d.yhat) AS dw
       FROM ex e JOIN d2 d ON e.doc_id = d.doc_id
       WHERE d.y <> d.yhat GROUP BY e.tok),
n2 AS (SELECT count(*) AS m FROM d2 WHERE y <> yhat),
m3 AS (SELECT e.doc_id, max(e.y) AS y,
         sum(coalesce(g1.dw, 0) + coalesce(g2.dw, 0)) AS marg
       FROM ex e LEFT JOIN g1 ON e.tok = g1.tok
                 LEFT JOIN g2 ON e.tok = g2.tok GROUP BY e.doc_id),
d3 AS (SELECT doc_id, y, CASE WHEN marg > 0 THEN 1 ELSE 0 END AS yhat
       FROM m3),
g3 AS (SELECT e.tok, 0.5 * sum(d.y - d.yhat) AS dw
       FROM ex e JOIN d3 d ON e.doc_id = d.doc_id
       WHERE d.y <> d.yhat GROUP BY e.tok),
n3 AS (SELECT count(*) AS m FROM d3 WHERE y <> yhat),
v(token) AS (VALUES {vrows}),
w AS (SELECT v.token,
        coalesce(g1.dw, 0) + coalesce(g2.dw, 0) + coalesce(g3.dw, 0)
          AS weight
      FROM v LEFT JOIN g1 ON v.token = g1.tok
             LEFT JOIN g2 ON v.token = g2.tok
             LEFT JOIN g3 ON v.token = g3.tok)
SELECT token, weight::DOUBLE AS weight FROM w
UNION ALL SELECT '__mistakes_1', (SELECT m FROM n1)::DOUBLE
UNION ALL SELECT '__mistakes_2', (SELECT m FROM n2)::DOUBLE
UNION ALL SELECT '__mistakes_3', (SELECT m FROM n3)::DOUBLE
"""


def _funnel_trend_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily funnel conversion trend: cohort = users whose FIRST view falls
    on day D; converted = a purchase strictly after that first view. Two
    chained windows on ONE user-keyed exchange (first-view, then
    converted-after) — no self-join of events against events."""
    from pyspark.sql import Window

    ev = ts_ns(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id")
    fv = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    with_fv = ev.withColumn("__fv", fv)
    cv = F.max(F.when((F.col("event_type") == "purchase")
                      & (F.col("ts") > F.col("__fv")), 1)
               .otherwise(0)).over(w)
    per_user = (with_fv.withColumn("__cv", cv)
                .groupBy("user_id")
                .agg(F.first("__fv").alias("__fv"),
                     F.max("__cv").alias("__conv"))
                .where(F.col("__fv").isNotNull()))
    return (per_user
            .groupBy(F.expr(f"__fv DIV {NANOS_DAY}").alias("day_idx"))
            .agg(F.count(F.lit(1)).alias("n_started"),
                 F.sum("__conv").alias("n_converted"))
            .withColumn("conv_rate",
                        F.round(F.col("n_converted")
                                / F.col("n_started"), 6)))


# ExactSubstr: duplicate 20-token windows merged into maximal per-doc
# spans — shared by the span-listing and span-removal oracles.
_SUBSTR_SPANS_SQL = """w AS (SELECT doc_id, i AS start, md5(array_to_string(tk[i:i+19], ' ')) AS h
      FROM toks, unnest(range(1, greatest(len(tk)-18, 1))) AS t(i)),
d AS (SELECT doc_id, start FROM (
        SELECT doc_id, start, count(*) OVER (PARTITION BY h) AS c FROM w)
      WHERE c > 1),
m AS (SELECT doc_id, start,
        CASE WHEN start - lag(start) OVER (PARTITION BY doc_id ORDER BY start) > 20
             THEN 1 ELSE 0 END AS brk FROM d),
isl AS (SELECT doc_id, start,
        sum(brk) OVER (PARTITION BY doc_id ORDER BY start) AS island FROM m)"""


QUERIES: dict[str, tuple] = {
    # ---- reference query shapes (SURVEY §2) ------------------------------- #
    "fr_empty_query": (
        _fr_counts(Q_EMPTY),
        "SELECT count(DISTINCT user_id)::BIGINT AS matching_groups, "
        "count(*)::BIGINT AS matching_group_rows FROM events",
    ),
    "fr_count_target": (
        _fr_counts(Q_PURCHASE3),
        _COUNTS_SQL_SHELL.format(matched=(
            "SELECT user_id FROM events GROUP BY user_id "
            "HAVING count(*) FILTER (WHERE event_type = 'purchase') >= 3")),
    ),
    "fr_include_zero": (
        _fr_counts(Q_ZERO_ERRORS),
        _COUNTS_SQL_SHELL.format(matched=(
            "SELECT user_id FROM events GROUP BY user_id "
            "HAVING count(*) FILTER (WHERE event_type = 'error') = 0")),
    ),
    "fr_sum_target": (
        _fr_counts(Q_SUM_TARGET),
        _COUNTS_SQL_SHELL.format(matched=(
            "SELECT user_id FROM events WHERE event_type = 'purchase' "
            "GROUP BY user_id HAVING sum(value) > 900.37")),
    ),
    "fr_multi_filter": (
        _fr_counts(Q_MULTI_FILTER),
        _COUNTS_SQL_SHELL.format(matched=(
            "SELECT user_id FROM events GROUP BY user_id HAVING count(*) "
            "FILTER (WHERE event_type = 'purchase' AND value >= 150.0) >= 2")),
    ),
    "fr_relation_expr": (
        _fr_counts(Q_RELATION),
        _COUNTS_SQL_SHELL.format(matched=(
            "SELECT user_id FROM events GROUP BY user_id HAVING "
            "((count(*) FILTER (WHERE event_type = 'purchase') >= 1) OR "
            " (coalesce(sum(value) FILTER (WHERE event_type = 'error'), 0) >= 500.37 "
            "  AND count(*) FILTER (WHERE event_type = 'error') > 0)) AND "
            "(count(*) FILTER (WHERE event_type = 'click') >= 5)")),
    ),
    "fr_timeframe": (
        _fr_counts(Q_TIMEFRAME),
        """
WITH ev AS (SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-05'
            AND ts < TIMESTAMP '2024-01-15'),
m AS (SELECT user_id FROM ev GROUP BY user_id
      HAVING count(*) FILTER (WHERE event_type = 'purchase') >= 1),
r AS (SELECT count(*) c FROM ev WHERE user_id IN (SELECT user_id FROM m))
SELECT (SELECT count(*) FROM m)::BIGINT AS matching_groups,
       (SELECT c FROM r)::BIGINT AS matching_group_rows
""",
    ),
    "fr_string_ops": (
        _fr_counts(Q_STRING_OPS),
        _COUNTS_SQL_SHELL.format(matched=(
            "SELECT user_id FROM events GROUP BY user_id HAVING "
            "count(*) FILTER (WHERE coalesce(contains(props, '\"k\": 7}'), false)) >= 1 "
            "AND count(*) FILTER (WHERE coalesce(NOT contains(props, '\"k\": 1'), true)) >= 10")),
    ),
    "fr_regex_filter": (
        _fr_counts(Q_REGEX),
        _COUNTS_SQL_SHELL.format(matched=(
            "SELECT user_id FROM events GROUP BY user_id HAVING "
            "count(*) FILTER (WHERE coalesce(regexp_matches(props, '\"k\": 4[0-9]}'), false)) >= 1")),
    ),
    "fr_agg_count_per_value": (
        _fr_aggregation(Q_PURCHASE1, {"column": "event_type", "type": "countPerValue", "top": 10}),
        """
WITH m AS (SELECT user_id FROM events GROUP BY user_id
           HAVING count(*) FILTER (WHERE event_type = 'purchase') >= 1),
r AS (SELECT * FROM events WHERE user_id IN (SELECT user_id FROM m))
SELECT event_type AS value, count(*)::BIGINT AS "count" FROM r
GROUP BY 1 ORDER BY "count" DESC, value ASC LIMIT 10
""",
    ),
    "fr_agg_groups_per_value": (
        _fr_aggregation(Q_EMPTY, {"column": "event_type", "type": "groupsPerValue", "top": 10}),
        "SELECT event_type AS value, count(DISTINCT user_id)::BIGINT AS groups "
        "FROM events GROUP BY 1 ORDER BY groups DESC, value ASC LIMIT 10",
    ),
    "fr_agg_sum_per_value": (
        _fr_aggregation(Q_EMPTY, {"column": "event_type", "type": "sumPerValue",
                                  "otherColumn": "value", "top": 10},
                        post=lambda out: out.select(
                            "value", F.round("sum", 2).alias("sum_value"))),
        "SELECT * FROM (SELECT event_type AS value, round(sum(value), 2) AS sum_value "
        "FROM events GROUP BY 1 ORDER BY sum(value) DESC, value ASC LIMIT 10)",
    ),
    "fr_agg_mean_per_value": (
        _fr_aggregation(Q_EMPTY, {"column": "event_type", "type": "meanPerValue",
                                  "otherColumn": "value", "top": 10},
                        post=lambda out: out.select(
                            "value", F.round("mean", 4).alias("mean_value"))),
        "SELECT * FROM (SELECT event_type AS value, round(avg(value), 4) AS mean_value "
        "FROM events GROUP BY 1 ORDER BY avg(value) DESC, value ASC LIMIT 10)",
    ),
    "fr_sequence": (
        _fr_counts(Q_SEQUENCE),
        "WITH " + _SEQ_STEPS_SQL + """,
m AS (SELECT user_id FROM s2),
r AS (SELECT count(*) c FROM events WHERE user_id IN (SELECT user_id FROM m))
SELECT (SELECT count(*) FROM m)::BIGINT AS matching_groups,
       (SELECT c FROM r)::BIGINT AS matching_group_rows
""",
    ),
    # the SAME sequence query off a declared bucketBy(user_id)
    # sortBy(user_id, ts) layout (r12): window anchors ride the scan's
    # own clustering + order — no exchange, no sort; sort_free
    # self-certifies the plan shape alongside the value oracle
    "fr_sequence_sorted_layout": (
        _fr_sequence_sorted_layout_fn,
        "WITH " + _SEQ_STEPS_SQL + """,
m AS (SELECT user_id FROM s2),
r AS (SELECT count(*) c FROM events WHERE user_id IN (SELECT user_id FROM m))
SELECT (SELECT count(*) FROM m)::BIGINT AS matching_groups,
       (SELECT c FROM r)::BIGINT AS matching_group_rows,
       true AS sort_free
""",
    ),
    # the SAME sequence query through the r9 segmented-fold strategy
    # (per-(group, ts-range-segment) partial folds + exit-table merge —
    # the whale-group path; compiler.sequence_fold_done_segmented): one
    # oracle, three strategies, driver-gated like any operator
    "fr_sequence_segmented": (
        _fr_counts(Q_SEQUENCE, sequence_strategy="fold_segmented"),
        "WITH " + _SEQ_STEPS_SQL + """,
m AS (SELECT user_id FROM s2),
r AS (SELECT count(*) c FROM events WHERE user_id IN (SELECT user_id FROM m))
SELECT (SELECT count(*) FROM m)::BIGINT AS matching_groups,
       (SELECT c FROM r)::BIGINT AS matching_group_rows
""",
    ),
    "fr_funnel_steps": (
        _funnel_steps_fn,
        "WITH " + _SEQ_STEPS_SQL + """
SELECT 0 AS step, (SELECT count(*) FROM s0)::BIGINT AS matching_groups,
       (SELECT count(*) FROM events WHERE user_id IN (SELECT user_id FROM s0))::BIGINT AS matching_group_rows
UNION ALL
SELECT 1, (SELECT count(*) FROM s1)::BIGINT,
       (SELECT count(*) FROM events WHERE user_id IN (SELECT user_id FROM s1))::BIGINT
UNION ALL
SELECT 2, (SELECT count(*) FROM s2)::BIGINT,
       (SELECT count(*) FROM events WHERE user_id IN (SELECT user_id FROM s2))::BIGINT
""",
    ),
    "fr_funnel_step_agg": (
        _funnel_step_agg_fn,
        "WITH " + _SEQ_STEPS_SQL + """
SELECT event_type AS value, count(*)::BIGINT AS "count"
FROM events WHERE user_id IN (SELECT user_id FROM s1)
GROUP BY 1 ORDER BY "count" DESC, value ASC LIMIT 10
""",
    ),
    "fr_seq_multi_filter_step": (
        _fr_groups_only(Q_SEQ_MULTIFILTER),
        """
WITH s0 AS (SELECT user_id, min(ts) t FROM events
            WHERE event_type = 'view' AND value >= 50.0 GROUP BY 1),
s1 AS (SELECT e.user_id FROM events e JOIN s0 ON e.user_id = s0.user_id
       AND e.ts > s0.t WHERE e.event_type = 'purchase' GROUP BY 1)
SELECT count(*)::BIGINT AS matching_groups FROM s1
""",
    ),
    "fr_seq_max_duration": (
        _fr_groups_only(Q_SEQ_MAXDUR),
        """
WITH s0 AS (SELECT user_id, min(ts) t FROM events WHERE event_type = 'signup' GROUP BY 1),
s1 AS (SELECT e.user_id FROM events e JOIN s0 ON e.user_id = s0.user_id
       AND e.ts > s0.t AND e.ts <= s0.t + INTERVAL 2 DAY
       WHERE e.event_type = 'purchase' GROUP BY 1)
SELECT count(*)::BIGINT AS matching_groups FROM s1
""",
    ),
    # the SAME maxDuration sequence through the r10 segmented strategy
    # (first-anchor join + duration-windowed exit tables — the
    # whale × maxDuration path; compiler._segmented_fold_max_duration):
    # one oracle, two strategies, driver-gated like any operator
    "fr_seq_max_duration_segmented": (
        _fr_groups_only(Q_SEQ_MAXDUR, sequence_strategy="fold_segmented"),
        """
WITH s0 AS (SELECT user_id, min(ts) t FROM events WHERE event_type = 'signup' GROUP BY 1),
s1 AS (SELECT e.user_id FROM events e JOIN s0 ON e.user_id = s0.user_id
       AND e.ts > s0.t AND e.ts <= s0.t + INTERVAL 2 DAY
       WHERE e.event_type = 'purchase' GROUP BY 1)
SELECT count(*)::BIGINT AS matching_groups FROM s1
""",
    ),
    "fr_seq_row_not_found": (
        _fr_groups_only(Q_SEQ_NOT),
        """
WITH s0 AS (SELECT user_id, min(ts) t FROM events WHERE event_type = 'signup' GROUP BY 1),
ok1 AS (SELECT s0.user_id, s0.t FROM s0 WHERE NOT EXISTS (
        SELECT 1 FROM events e WHERE e.user_id = s0.user_id
        AND e.event_type = 'error' AND e.ts > s0.t)),
s2 AS (SELECT e.user_id FROM events e JOIN ok1 ON e.user_id = ok1.user_id
       AND e.ts > ok1.t WHERE e.event_type = 'purchase' GROUP BY 1)
SELECT count(*)::BIGINT AS matching_groups FROM s2
""",
    ),
    # an absence-step sequence through the r11 anchor-chain form
    # (chained per-group min aggregates — the whale-safe rowFound:false
    # path; compiler.sequence_anchor_chain, reached via
    # sequence_strategy="fold_segmented"). The absence step is SELECTIVE
    # (high-value errors) so the gate verifies non-zero matches (18
    # groups at sf0.01) rather than passing on an all-excluded stream.
    "fr_seq_row_not_found_segmented": (
        _fr_groups_only(Q_SEQ_NOT_SEL, sequence_strategy="fold_segmented"),
        """
WITH s0 AS (SELECT user_id, min(ts) t FROM events WHERE event_type = 'signup' GROUP BY 1),
ok1 AS (SELECT s0.user_id, s0.t FROM s0 WHERE NOT EXISTS (
        SELECT 1 FROM events e WHERE e.user_id = s0.user_id
        AND e.event_type = 'error' AND e.value > 90.0 AND e.ts > s0.t)),
s2 AS (SELECT e.user_id FROM events e JOIN ok1 ON e.user_id = ok1.user_id
       AND e.ts > ok1.t WHERE e.event_type = 'purchase' GROUP BY 1)
SELECT count(*)::BIGINT AS matching_groups FROM s2
""",
    ),
    "fr_registration_profile": (
        _registration_profile_fn,
        "SELECT count(*)::BIGINT AS total_rows, count(DISTINCT user_id)::BIGINT AS n_groups, "
        "round(min(value), 2) AS min_value, round(max(value), 2) AS max_value, "
        "count(DISTINCT event_type)::BIGINT AS n_event_types FROM events",
    ),
    "fr_lineitem_engine": (
        _fr_lineitem_fn,
        """
WITH li AS (SELECT * FROM lineitem WHERE epoch(l_shipdate) >= 757382400
            AND epoch(l_shipdate) < 820454400),
m AS (SELECT l_orderkey FROM li GROUP BY l_orderkey
      HAVING coalesce(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 0) > 50000.37
         AND count(*) FILTER (WHERE l_discount > 0.05) > 0
         AND count(*) FILTER (WHERE l_returnflag = 'N') >= 2),
r AS (SELECT count(*) c FROM li WHERE l_orderkey IN (SELECT l_orderkey FROM m))
SELECT (SELECT count(*) FROM m)::BIGINT AS matching_groups,
       (SELECT c FROM r)::BIGINT AS matching_group_rows
""",
    ),
    "fr_agg_groups_skew_path": (
        lambda spark, sf_dir: skew.groups_per_value_skewed(
            load_table(spark, sf_dir, "events"), "event_type", "user_id"),
        "SELECT event_type AS value, count(DISTINCT user_id)::BIGINT AS groups "
        "FROM events GROUP BY 1",
    ),
    # ---- temporal operators (sessionization / as-of / range join) --------- #
    "sessionize_events": (
        _sessionize_fn,
        f"""
WITH s AS (SELECT user_id, ts,
  CASE WHEN lag(ts) OVER w IS NULL
       OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > {NANOS_2H} THEN 1 ELSE 0
  END AS ns
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s2 AS (SELECT user_id, ts,
  sum(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) - 1
  AS idx FROM s)
SELECT user_id, user_id || '#' || idx AS session_id,
  count(*)::BIGINT AS n_events,
  min(epoch_us(ts))::BIGINT AS start_us, max(epoch_us(ts))::BIGINT AS end_us,
  (max(epoch_us(ts)) - min(epoch_us(ts)))::BIGINT AS duration_us
FROM s2 GROUP BY 1, 2
""",
    ),
    "asof_join_clicks": (
        _asof_join_fn,
        """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, value AS click_value FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, epoch_us(p.ts)::BIGINT AS ts_us, c.click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
""",
    ),
    "asof_join_forward": (
        _asof_forward_fn,
        """
WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts, value AS purchase_value FROM events WHERE event_type = 'purchase')
SELECT v.event_id, v.user_id, epoch_us(v.ts)::BIGINT AS ts_us, p.purchase_value
FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.ts <= p.ts
""",
    ),
    "range_join_value_bands": (
        _range_join_fn,
        """
WITH bands AS (
  SELECT lo::DOUBLE AS band_lo, (lo + 40)::DOUBLE AS band_hi
  FROM unnest(range(0, 200, 40)) t(lo)
  UNION ALL SELECT 200.0, 1e9)
SELECT b.band_lo, b.band_hi, count(*)::BIGINT AS n_events,
       round(sum(e.value), 2) AS sum_value
FROM events e JOIN bands b ON e.value >= b.band_lo AND e.value < b.band_hi
GROUP BY 1, 2
""",
    ),
    # ---- general-OLAP breadth (TPC-H-shaped) ------------------------------ #
    "olap_pricing_summary": (
        _olap_pricing_summary_fn,
        """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  round(avg(l_quantity), 4) AS avg_qty,
  count(*)::BIGINT AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2 ORDER BY 1, 2
""",
    ),
    "olap_top_orders": (
        _olap_top_orders_fn,
        """
SELECT o.o_orderkey AS orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY 1 ORDER BY revenue DESC, orderkey ASC LIMIT 10
""",
    ),
    "olap_revenue_filter": (
        _olap_revenue_filter_fn,
        """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*)::BIGINT AS n_rows
FROM lineitem
WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
""",
    ),
    "audience_segments": (
        _audience_segments_fn,
        """
WITH a AS (SELECT user_id FROM events GROUP BY user_id
           HAVING count(*) FILTER (WHERE event_type = 'purchase') >= 14),
     b AS (SELECT user_id FROM events GROUP BY user_id
           HAVING count(*) FILTER (WHERE event_type = 'error') >= 14)
SELECT segment, count(*)::BIGINT AS n_groups FROM (
  SELECT CASE WHEN a.user_id IS NOT NULL AND b.user_id IS NOT NULL THEN 'both'
              WHEN a.user_id IS NOT NULL THEN 'a_only'
              ELSE 'b_only' END AS segment
  FROM a FULL OUTER JOIN b ON a.user_id = b.user_id)
GROUP BY segment
""",
    ),
    "olap_join_chain": (
        _olap_join_chain_fn,
        """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM region JOIN nation ON n_regionkey = r_regionkey
 JOIN customer ON c_nationkey = n_nationkey
 JOIN orders ON o_custkey = c_custkey
 JOIN lineitem ON l_orderkey = o_orderkey
 JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
GROUP BY 1 ORDER BY revenue DESC, n_name ASC
""",
    ),
    "olap_pivot": (
        _olap_pivot_fn,
        """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F')::BIGINT AS n_f,
       count(*) FILTER (WHERE o_orderstatus = 'O')::BIGINT AS n_o,
       count(*) FILTER (WHERE o_orderstatus = 'P')::BIGINT AS n_p
FROM orders GROUP BY 1 ORDER BY 1
""",
    ),
    "event_gap_stats": (
        _event_gap_stats_fn,
        """
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events)
SELECT event_type, count(gap_us)::BIGINT AS n_gaps,
       sum(gap_us)::BIGINT AS sum_gap_us, max(gap_us)::BIGINT AS max_gap_us
FROM g GROUP BY 1 ORDER BY 1
""",
    ),
    "olap_percentiles": (
        _olap_percentiles_fn,
        """
SELECT l_returnflag,
       round(quantile_cont(round(l_extendedprice * 100)::BIGINT, 0.5), 2) AS p50_cents,
       round(quantile_cont(round(l_extendedprice * 100)::BIGINT, 0.95), 2) AS p95_cents,
       round(quantile_cont(l_quantity, 0.25), 2) AS p25_qty
FROM lineitem GROUP BY l_returnflag
""",
    ),
    "olap_rollup": (
        _olap_rollup_fn,
        """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*)::BIGINT AS n_rows, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    ),
    "olap_distinct": (
        _olap_distinct_fn,
        """
SELECT l_returnflag, count(DISTINCT l_partkey)::BIGINT AS n_parts,
       count(DISTINCT l_suppkey)::BIGINT AS n_supps,
       round(sum(DISTINCT l_quantity), 2) AS sum_distinct_qty
FROM lineitem GROUP BY l_returnflag
""",
    ),
    # ---- training-data pipeline operators --------------------------------- #
    "text_tokens": (
        _text_tokens_fn,
        """
WITH toks AS (""" + _TOKS_SQL + """)
SELECT doc_id, len(tk)::INT AS n_tokens,
  len(regexp_extract_all(lower(text), '[a-z]{1,4}|[0-9]|[^a-z0-9\\s]'))::INT
    AS n_bpe_tokens
FROM toks
""",
    ),
    "ann_lsh_bucketed": (
        _ann_lsh_pairs_fn,
        """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
hp AS (SELECT b, list_transform(range(0, 64), d ->
         CASE WHEN substr(md5(b || ':' || d), 1, 1)
              IN ('8','9','a','b','c','d','e','f')
         THEN 1.0 ELSE -1.0 END) AS h
       FROM unnest(range(0, 16)) t(b)),
proj AS (SELECT e.vec_id, hp.b,
           CASE WHEN list_dot_product(e.v, hp.h) > 0 THEN 1 ELSE 0 END AS bit
         FROM e, hp),
bk AS (SELECT vec_id, b // 4 AS tbl,
         sum(bit << (b % 4))::BIGINT AS bucket
       FROM proj GROUP BY vec_id, b // 4),
eb AS (SELECT e.vec_id, e.v, bk.tbl, bk.bucket FROM e JOIN bk USING (vec_id)),
pairs AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM eb a JOIN eb b ON a.tbl = b.tbl AND a.bucket = b.bucket
          AND a.vec_id < b.vec_id)
SELECT p.id_a, p.id_b,
  round(list_dot_product(ea.v, eb2.v) /
        (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb2.v, eb2.v))), 6)
    AS cosine_sim
FROM pairs p JOIN e ea ON p.id_a = ea.vec_id JOIN e eb2 ON p.id_b = eb2.vec_id
WHERE round(list_dot_product(ea.v, eb2.v) /
        (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb2.v, eb2.v))), 6) >= 0.4
""",
    ),
    "dedup_exact": (
        _dedup_exact_fn,
        "WITH h AS (SELECT md5(text) AS ch, count(*) AS c FROM documents GROUP BY 1) "
        "SELECT count(*)::BIGINT AS n_distinct, sum(c)::BIGINT AS n_docs, "
        "sum(CASE WHEN c >= 2 THEN c - 1 ELSE 0 END)::BIGINT AS n_redundant FROM h",
    ),
    "dedup_ngram_jaccard": (
        _jaccard_pairs_fn,
        "WITH g AS (" + _GRAMS_SQL + """)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.gr, b.gr))::DOUBLE /
             (len(a.gr) + len(b.gr) - len(list_intersect(a.gr, b.gr))), 6) AS jaccard
FROM g a JOIN g b ON a.doc_id < b.doc_id
WHERE round(len(list_intersect(a.gr, b.gr))::DOUBLE /
            (len(a.gr) + len(b.gr) - len(list_intersect(a.gr, b.gr))), 6) >= 0.5
""",
    ),
    "dedup_minhash_lsh": (
        _minhash_pairs_fn,
        _MINHASH_PAIRS_SQL,
    ),
    # End-to-end dedup pipeline: candidate pairs -> connected components ->
    # survivor filter. The oracle expresses the iterative clustering as a
    # recursive CTE: cc(id, lbl) holds every id that can reach a SMALLER id
    # (base: an edge to a smaller neighbor; step: a neighbor's known smaller
    # label propagates). A doc is dropped iff it appears in cc — identical
    # to apply_dedup keeping the min id of each cluster.
    "dedup_pipeline_minhash": (
        _dedup_pipeline_fn,
        """
WITH RECURSIVE pairs AS (""" + _MINHASH_PAIRS_SQL + """),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
cc(id, lbl) AS (
  SELECT src, dst FROM edges WHERE dst < src
  UNION
  SELECT e.src, c.lbl FROM edges e JOIN cc c ON c.id = e.dst
  WHERE c.lbl < e.src
)
SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id FROM cc)
""",
    ),
    # Capstone: the full curation chain, value-gated end-to-end by composing
    # the dedup recursive-CTE, quality, and contamination oracles.
    "curation_pipeline": (
        _curation_pipeline_fn,
        """
WITH RECURSIVE pairs AS (""" + _MINHASH_PAIRS_SQL + """),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
cc(id, lbl) AS (
  SELECT src, dst FROM edges WHERE dst < src
  UNION
  SELECT e.src, c.lbl FROM edges e JOIN cc c ON c.id = e.dst
  WHERE c.lbl < e.src
),
qual AS (""" + _QUALITY_SQL + """),
cont AS (WITH g AS (""" + _grams_sql(5) + """),
  eg AS (SELECT DISTINCT unnest(gr) AS gram FROM g WHERE doc_id % 97 = 0),
  cg AS (SELECT doc_id, unnest(gr) AS gram FROM g WHERE doc_id % 97 <> 0)
  SELECT DISTINCT cg.doc_id FROM cg JOIN eg ON cg.gram = eg.gram)
SELECT doc_id FROM documents
WHERE doc_id % 97 <> 0
  AND doc_id NOT IN (SELECT id FROM cc)
  AND doc_id IN (SELECT doc_id FROM qual WHERE quality >= 0.9)
  AND doc_id NOT IN (SELECT doc_id FROM cont)
""",
    ),
    "decontaminate_ngram": (
        _decontaminate_fn,
        "WITH g AS (" + _GRAMS_SQL + """),
eg AS (SELECT DISTINCT unnest(gr) AS gram FROM g WHERE doc_id % 97 = 0),
cg AS (SELECT doc_id, unnest(gr) AS gram FROM g WHERE doc_id % 97 <> 0)
SELECT cg.doc_id, count(*)::BIGINT AS n_shared
FROM cg JOIN eg ON cg.gram = eg.gram GROUP BY cg.doc_id
""",
    ),
    "dedup_simhash": (
        _simhash_fn,
        """
WITH toks AS (""" + _TOKS_SQL + """)
SELECT doc_id, list_sum(list_transform(range(0, 16), j ->
  CASE WHEN list_sum(list_transform(tk, w ->
    CASE WHEN substr(md5(w), j+1, 1) IN ('8','9','a','b','c','d','e','f')
    THEN 1 ELSE -1 END)) > 0 THEN 1<<j ELSE 0 END))::BIGINT AS simhash
FROM toks
""",
    ),
    "text_stats": (
        _text_stats_fn,
        """
WITH toks AS (""" + _TOKS_SQL + """)
SELECT doc_id, length(text)::INT AS n_chars, len(tk)::INT AS n_tokens,
  round(length(text)::DOUBLE / greatest(len(tk), 1), 6) AS chars_per_token,
  round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE / greatest(length(text), 1), 6) AS punct_ratio,
  round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / greatest(length(text), 1), 6) AS digit_ratio,
  round((length(text) - length(regexp_replace(text, '\\s', '', 'g')))::DOUBLE / greatest(length(text), 1), 6) AS space_ratio
FROM toks
""",
    ),
    "text_quality": (
        _text_quality_fn,
        _QUALITY_SQL,
    ),
    "sample_deterministic": (
        _hash_sample_fn,
        # same md5-prefix gate as sampling.sample_gate (11 hex chars -> int64)
        """
SELECT doc_id FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 11))::BIGINT < 4398046511104
""",
    ),
    "sample_stratified": (
        _stratified_sample_fn,
        """
SELECT event_id, user_id, event_type FROM events
WHERE CASE event_type
  WHEN 'view' THEN ('0x' || substr(md5(user_id::VARCHAR), 1, 11))::BIGINT < 1759218604441
  WHEN 'purchase' THEN ('0x' || substr(md5(user_id::VARCHAR), 1, 11))::BIGINT < 17592186044416
  ELSE FALSE END
""",
    ),
    "sample_weighted": (
        _weighted_sample_fn,
        # Efraimidis–Spirakis u^(1/w) with u from the same md5 gate as
        # sample_deterministic; top-50 keys = the weighted sample.
        """
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         pow((('0x' || substr(md5(doc_id::VARCHAR), 1, 11))::BIGINT + 0.5)
             / 17592186044416.0, 1.0 / n_chars) AS k
  FROM documents WHERE n_chars > 0)
ORDER BY k DESC, doc_id LIMIT 50
""",
    ),
    "top_docs_per_lang": (
        _top_docs_fn,
        """
SELECT lang, doc_id, n_chars, rnk::INT AS rnk FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rnk
  FROM documents) WHERE rnk <= 3
""",
    ),
    "text_chunks": (
        _chunk_documents_fn,
        # Non-overlapping 16-token windows; slices mirror text.chunk_documents
        # (DuckDB list slice bounds are 1-based inclusive). CASED tokens:
        # chunk_text preserves original casing.
        """
WITH toks AS (""" + _TOKS_CASED_SQL + """),
c AS (SELECT doc_id, tk,
  unnest(range(0, greatest(ceil((len(tk) - 16) / 16.0) + 1, 1)::BIGINT)) AS cid
  FROM toks)
SELECT doc_id, cid::INT AS chunk_id,
  len(tk[cid*16+1 : cid*16+16])::INT AS n_chunk_tokens,
  array_to_string(tk[cid*16+1 : cid*16+16], ' ') AS chunk_text
FROM c
""",
    ),
    "text_vocab": (
        _vocabulary_fn,
        # top-200 by (count desc, token asc); deterministic tie-break keeps
        # the LIMIT stable across engines
        """
WITH toks AS (""" + _TOKS_SQL + """),
pd AS (SELECT doc_id, unnest(tk) AS token FROM toks),
td AS (SELECT token, doc_id, count(*) AS c FROM pd GROUP BY 1, 2)
SELECT token, sum(c)::BIGINT AS n_occurrences, count(*)::BIGINT AS n_docs
FROM td GROUP BY token HAVING sum(c) >= 5
ORDER BY n_occurrences DESC, token ASC LIMIT 200
""",
    ),
    "text_pack_blocks": (
        _pack_blocks_fn,
        # Mirrors text.pack_token_blocks: 8-way shard on doc_id, per-shard
        # token stream in doc_id order, 128-token blocks; md5 over the
        # block's space-joined tokens verifies packing bit-for-bit.
        """
WITH toks AS (""" + _TOKS_CASED_SQL + """),
t AS (SELECT doc_id,
        ('0x' || substr(md5(doc_id::VARCHAR), 1, 11))::BIGINT % 8 AS shard,
        tk, len(tk) AS n
      FROM toks WHERE len(tk) > 0),
o AS (SELECT *, coalesce(sum(n) OVER (PARTITION BY shard ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st FROM t),
e AS (SELECT shard, doc_id, tk, n, st,
        unnest(range((st // 128)::BIGINT,
                     ((st + n - 1) // 128 + 1)::BIGINT)) AS block_id FROM o),
c AS (SELECT shard, block_id, doc_id,
        least(n, (block_id+1)*128 - st) - greatest(block_id*128 - st, 0) AS ct,
        array_to_string(tk[(greatest(block_id*128 - st, 0) + 1)::BIGINT
                           : least(n, (block_id+1)*128 - st)::BIGINT],
                        ' ') AS chunk
      FROM e)
SELECT shard::BIGINT AS shard, block_id::BIGINT AS block_id,
       count(*)::BIGINT AS n_docs, sum(ct)::BIGINT AS n_tokens,
       md5(string_agg(chunk, ' ' ORDER BY doc_id)) AS block_md5
FROM c GROUP BY 1, 2
""",
    ),
    "text_repetition": (
        _text_repetition_fn,
        # Non-distinct contiguous n-grams (duplicates kept) mirror
        # text._contiguous_ngrams; dup fraction = 1 - distinct/total.
        """
WITH toks AS (""" + _TOKS_SQL + """),
g AS (SELECT doc_id, tk,
  list_transform(range(1, greatest(len(tk) - 0, 1)),
                 i -> array_to_string(tk[i:i+1], ' ')) AS g2,
  list_transform(range(1, greatest(len(tk) - 1, 1)),
                 i -> array_to_string(tk[i:i+2], ' ')) AS g3
  FROM toks)
SELECT doc_id, len(tk)::INT AS n_tokens,
  round((len(tk) - len(list_distinct(tk)))::DOUBLE / greatest(len(tk), 1), 6) AS dup_token_frac,
  round((len(g2) - len(list_distinct(g2)))::DOUBLE / greatest(len(g2), 1), 6) AS dup_2gram_frac,
  round((len(g3) - len(list_distinct(g3)))::DOUBLE / greatest(len(g3), 1), 6) AS dup_3gram_frac
FROM g
""",
    ),
    "text_langid": (
        _langid_fn,
        """
WITH toks AS (""" + _TOKS_SQL + """),
s AS (SELECT doc_id,
  len(list_intersect(tk, ['der','die','das','und','ist','von','mit','den','im','ein'])) AS s_de,
  len(list_intersect(tk, ['the','a','of','and','to','in','is','that','it','for'])) AS s_en,
  len(list_intersect(tk, ['el','la','de','que','y','en','un','por','con','los'])) AS s_es,
  len(list_intersect(tk, ['le','la','de','et','est','un','une','dans','que','pour'])) AS s_fr
  FROM toks)
SELECT doc_id, CASE
  WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
  WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
  WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
  WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
  ELSE 'fr' END AS lang_pred
FROM s
""",
    ),
    "text_fingerprint": (
        _fingerprint_fn,
        "SELECT doc_id, md5(array_to_string(list_sort(list_distinct("
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))), ' ')) "
        "AS fingerprint FROM documents",
    ),
    "text_pii_redact": (
        _pii_redact_fn,
        r"""
WITH aug AS (SELECT doc_id,
  text || ' contact u' || doc_id || '@example.com ip 10.0.0.' ||
  (doc_id % 256) || ' tel +1-555-0100-1234' AS text FROM documents),
red AS (SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
    '\+?\d{1,3}[-. ]\d{2,4}[-. ]\d{3,4}[-. ]?\d{0,4}', '<PHONE>', 'g')
  AS redacted FROM aug)
SELECT doc_id, redacted,
  ((length(redacted) - length(replace(redacted, '<EMAIL>', ''))) / 7
   + (length(redacted) - length(replace(redacted, '<IP>', ''))) / 4
   + (length(redacted) - length(replace(redacted, '<PHONE>', ''))) / 7
  )::BIGINT AS n_redactions
FROM red
""",
    ),
    "ann_cosine_topk": (
        _ann_topk_fn,
        _BRUTE_TOPK_SQL,
    ),
    # Full-probe IVF searches every cell, so brute-force top-k is the exact
    # oracle — value-level proof the IVF join/score/rank machinery is right.
    "ann_ivf_fullprobe": (
        _ann_ivf_full_fn,
        _BRUTE_TOPK_SQL,
    ),
    "dedup_embedding_cosine": (
        _embedding_pairs_fn,
        """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_dot_product(a.v, b.v) /
        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v) /
        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.45
""",
    ),
    "decontaminate_semantic": (
        _semantic_contamination_fn,
        """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
ev AS (SELECT vec_id AS eval_id, v AS ev FROM e WHERE vec_id % 10 = 3)
SELECT e.vec_id AS vec_id, ev.eval_id AS eval_id,
  round(list_dot_product(e.v, ev.ev) /
        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(ev.ev, ev.ev))), 6) AS cosine_sim
FROM e CROSS JOIN ev
WHERE round(list_dot_product(e.v, ev.ev) /
        (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(ev.ev, ev.ev))), 6) >= 0.45
""",
    ),
    # Same survivors construction as dedup_pipeline_minhash, with cosine
    # pairs as the candidate generator (recursive-CTE clustering oracle).
    "dedup_pipeline_embedding": (
        _embedding_dedup_pipeline_fn,
        """
WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.v, b.v) /
        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
        6) >= 0.45),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
cc(id, lbl) AS (
  SELECT src, dst FROM edges WHERE dst < src
  UNION
  SELECT e2.src, c.lbl FROM edges e2 JOIN cc c ON c.id = e2.dst
  WHERE c.lbl < e2.src
)
SELECT vec_id FROM embeddings WHERE vec_id NOT IN (SELECT id FROM cc)
""",
    ),
    "sample_group_cap": (
        _group_cap_fn,
        """
WITH r AS (SELECT lang, doc_id,
    row_number() OVER (PARTITION BY lang
        ORDER BY md5('cap' || doc_id::VARCHAR), doc_id) AS rk
  FROM documents)
SELECT lang, doc_id FROM r WHERE rk <= 20
""",
    ),
    "multimodal_features_png": (
        _multimodal_png_fn,
        # closed-form features of the gradient fixture (see
        # synthesize_png_payloads): the Spark side actually zlib-decodes
        # and unfilters every PNG; the oracle recomputes what the pixels
        # must average to
        "SELECT doc_id AS id, (1 + doc_id % 16)::INT AS width, "
        "(1 + doc_id % 8)::INT AS height, "
        "round((doc_id % 200) + (doc_id % 16) / 2.0, 4) AS mean_r, "
        "round(((7 * doc_id) % 200) + (doc_id % 8) / 2.0, 4) AS mean_g, "
        "round(((13 * doc_id) % 256) * 1.0, 4) AS mean_b, "
        "true AS decode_ok FROM documents",
    ),
    "multimodal_features_jpeg": (
        _multimodal_jpeg_fn,
        # closed-form features of the constant-tile fixture (see
        # synthesize_jpeg_payloads): the Spark side actually
        # Huffman-decodes + IDCTs every JPEG; the oracle recomputes
        # what the tile grid must average to — exact because constant
        # blocks with DC-quant 8 and 128-chroma survive the lossy
        # format bit-for-bit
        "SELECT doc_id AS id, (8 * (1 + doc_id % 5))::INT AS width, "
        "(8 * (1 + doc_id % 3))::INT AS height, "
        "round((doc_id % 179) + 2.0 * (doc_id % 3) + (doc_id % 5), 4) AS mean_r, "
        "round((doc_id % 179) + 2.0 * (doc_id % 3) + (doc_id % 5), 4) AS mean_g, "
        "round((doc_id % 179) + 2.0 * (doc_id % 3) + (doc_id % 5), 4) AS mean_b, "
        "true AS decode_ok FROM documents",
    ),
    "multimodal_audio_wav": (
        _multimodal_wav_fn,
        # closed-form features of the square-wave fixture (see
        # synthesize_wav_payloads): the Spark side actually parses the
        # RIFF container and computes rms/peak/zero-crossings from the
        # decoded samples; the oracle restates the closed forms
        "SELECT doc_id AS id, (8000 * (1 + doc_id % 3))::INT AS sample_rate, "
        "1::INT AS channels, (64 * (1 + doc_id % 8))::BIGINT AS n_samples, "
        "((64 * (1 + doc_id % 8)) * 1000 // (8000 * (1 + doc_id % 3)))::BIGINT"
        " AS duration_ms, "
        "round((101 + 2 * (doc_id % 450)) / 32768.0, 6) AS rms, "
        "round((101 + 2 * (doc_id % 450)) / 32768.0, 6) AS peak, "
        "(64 * (1 + doc_id % 8) - 1)::BIGINT AS zero_crossings, "
        "true AS decode_ok FROM documents",
    ),
    "multimodal_video_y4m": (
        _multimodal_y4m_fn,
        # closed-form per-frame features of the constant-gray clip
        # fixture (see synthesize_y4m_payloads): the Spark side actually
        # parses the YUV planes of every frame; the oracle unnests a
        # frame series per doc and restates the gray ramp
        "SELECT doc_id AS id, f::INT AS frame_idx, "
        "(8 * (1 + doc_id % 3))::INT AS width, "
        "(8 * (1 + doc_id % 2))::INT AS height, "
        "(1 + doc_id % 4)::INT AS n_frames, 25.0 AS fps, "
        "round((doc_id % 200) + 10.0 * f, 4) AS mean_r, "
        "round((doc_id % 200) + 10.0 * f, 4) AS mean_g, "
        "round((doc_id % 200) + 10.0 * f, 4) AS mean_b, "
        "true AS decode_ok FROM documents, "
        "UNNEST(generate_series(0, (doc_id % 4)::BIGINT)) AS t(f)",
    ),
    "multimodal_audio_spectral": (
        _multimodal_spectral_fn,
        # closed-form single-line spectrum (see synthesize_tone_wav_payloads)
        "SELECT doc_id AS id, (64 * (1 + doc_id % 8))::BIGINT AS n_samples, "
        "(16 * (1 + doc_id % 8))::INT AS dominant_bin, "
        "round(2000.0 * (1 + doc_id % 3), 4) AS dominant_freq_hz, "
        "round(2000.0 * (1 + doc_id % 3), 2) AS spectral_centroid_hz, "
        "true AS decode_ok FROM documents",
    ),
    "multimodal_features": (
        _multimodal_fn,
        "SELECT doc_id AS id, strlen(text)::BIGINT AS byte_len, md5(text) AS digest, "
        "lower(hex(encode(substr(text, 1, 4)))) AS head_hex FROM documents",
    ),
    "s5_denorm_join": (
        _s5_denorm_join_fn,
        "SELECT c.c_mktsegment AS mktsegment, count(*)::BIGINT AS n_orders, "
        "round(sum(o.o_totalprice), 2) AS sum_totalprice FROM orders o "
        "JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY 1",
    ),
    "time_rollup_daily": (
        _time_rollup_fn,
        f"""
SELECT (epoch_ns(ts) - epoch_ns(ts) % {NANOS_DAY}) // 1000 AS bucket_us,
       event_type, count(*)::BIGINT AS n_events,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
""",
    ),
    "olap_cube": (
        _olap_cube_fn,
        """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*)::BIGINT AS n_rows, round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    ),
    "olap_grouping_sets": (
        _olap_grouping_sets_fn,
        """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*)::BIGINT AS n_rows, round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
    ),
    "olap_customer_deciles": (
        _olap_deciles_fn,
        # cents-exact per-customer spend BEFORE ranking, so the decile
        # frontier is reproducible across engines; custkey breaks ties
        """
WITH pc AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
            FROM orders GROUP BY 1),
d AS (SELECT spend, ntile(10) OVER (ORDER BY spend DESC, o_custkey ASC)
        AS decile FROM pc)
SELECT decile::INT AS decile, count(*)::BIGINT AS n_customers,
       round(sum(spend), 2) AS total_spend,
       round(min(spend), 2) AS min_spend, round(max(spend), 2) AS max_spend
FROM d GROUP BY 1
""",
    ),
    "text_tfidf": (
        _tfidf_fn,
        # same shape as the Spark plan: (doc, token) counts feed tf, df,
        # and doc length; scores rounded to 6 BEFORE the ranking window
        """
WITH toks AS (""" + _TOKS_SQL + """),
tfc AS (SELECT doc_id, token, count(*) AS tf
        FROM (SELECT doc_id, unnest(tk) AS token FROM toks) GROUP BY 1, 2),
lend AS (SELECT *, sum(tf) OVER (PARTITION BY doc_id) AS len FROM tfc),
dfreq AS (SELECT token, count(*) AS df FROM tfc GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
s AS (SELECT doc_id, token, tf,
        round((tf::DOUBLE / len::DOUBLE) * ln(n.n::DOUBLE / df::DOUBLE), 6)
          AS tfidf
      FROM lend JOIN dfreq USING (token) CROSS JOIN n),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        ORDER BY tfidf DESC, token ASC) AS term_rank FROM s)
SELECT doc_id, term_rank::INT AS term_rank, token, tf::BIGINT AS tf, tfidf
FROM r WHERE term_rank <= 3
""",
    ),
    "embedding_centroids": (
        _embedding_centroids_fn,
        """
SELECT label, (i - 1)::INT AS pos,
       round(avg(embedding[i]), 6) AS centroid_val,
       count(*)::BIGINT AS n_vectors
FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
GROUP BY label, i
""",
    ),
    "olap_promo_share": (
        _promo_share_fn,
        """
WITH j AS (SELECT date_trunc('month', l_shipdate) AS month,
        CAST(round(l_extendedprice * 100) AS BIGINT) AS cents, p_type
    FROM lineitem JOIN part ON l_partkey = p_partkey)
SELECT month,
  CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS BIGINT)
    AS promo_cents,
  CAST(sum(cents) AS BIGINT) AS total_cents,
  round(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)::DOUBLE
        / sum(cents)::DOUBLE, 6) AS promo_share
FROM j GROUP BY 1
""",
    ),
    "text_entropy": (
        _token_entropy_fn,
        """
WITH toks AS (""" + _TOKS_SQL + """),
tc AS (SELECT doc_id, token, count(*) AS c
       FROM (SELECT doc_id, unnest(tk) AS token FROM toks) GROUP BY 1, 2),
d AS (SELECT doc_id, sum(c) AS n, sum(c * ln(c)) AS s FROM tc GROUP BY 1)
SELECT doc_id, n::BIGINT AS n_tokens, round(ln(n) - s / n, 6) AS entropy
FROM d
""",
    ),
    "olap_part_avg_filter": (
        _part_avg_filter_fn,
        """
WITH p AS (SELECT l_partkey, 0.2 * avg(l_quantity) AS lim
           FROM lineitem GROUP BY 1)
SELECT count(*)::BIGINT AS n_rows,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l JOIN p USING (l_partkey) WHERE l.l_quantity < p.lim
""",
    ),
    "olap_winsorized_mean": (
        _winsorized_mean_fn,
        """
WITH b AS (SELECT l_returnflag,
        CAST(floor(quantile_cont(
            CAST(round(l_extendedprice * 100) AS BIGINT), 0.05)) AS BIGINT)
          AS lo,
        CAST(floor(quantile_cont(
            CAST(round(l_extendedprice * 100) AS BIGINT), 0.95)) AS BIGINT)
          AS hi
    FROM lineitem GROUP BY 1)
SELECT l.l_returnflag, count(*)::BIGINT AS n_rows,
       round(avg(least(greatest(
           CAST(round(l_extendedprice * 100) AS BIGINT), lo), hi)), 4)
         AS winsorized_mean_cents
FROM lineitem l JOIN b USING (l_returnflag) GROUP BY 1
""",
    ),
    "asof_join_tolerance": (
        _asof_tolerance_fn,
        """
WITH v AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'view'),
c AS (SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'),
m AS (SELECT v.event_id, max(c.cts) AS cts
      FROM v JOIN c ON v.user_id = c.user_id
       AND c.cts <= v.ts AND c.cts >= v.ts - INTERVAL 1 HOUR
      GROUP BY 1)
SELECT (SELECT count(*) FROM v)::BIGINT AS n_views,
       (SELECT count(*) FROM m)::BIGINT AS n_matched,
       (SELECT CAST(sum((epoch_ns(v.ts) - epoch_ns(m.cts)) // 1000)
                    AS BIGINT)
        FROM m JOIN v USING (event_id)) AS sum_delay_us
""",
    ),
    # ---- behavioral analytics (operators/behavior.py) --------------------- #
    "behavior_retention_weekly": (
        _retention_fn,
        """
WITH act AS (SELECT DISTINCT user_id,
        epoch_ns(ts) - epoch_ns(ts) % 604800000000000 AS period FROM events),
coh AS (SELECT user_id, min(period) AS cohort FROM act GROUP BY 1)
SELECT cohort, (period - cohort) // 604800000000000 AS period_index,
       count(*)::BIGINT AS n_active
FROM act JOIN coh USING (user_id)
GROUP BY 1, 2
""",
    ),
    "behavior_top_paths": (
        _top_paths_fn,
        """
WITH s AS (SELECT user_id, event_type AS s0,
        lead(event_type, 1) OVER w AS s1, lead(event_type, 2) OVER w AS s2
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
p AS (SELECT user_id, s0 || ' > ' || s1 || ' > ' || s2 AS path
      FROM s WHERE s2 IS NOT NULL)
SELECT path, count(*)::BIGINT AS n_paths,
       count(DISTINCT user_id)::BIGINT AS n_groups
FROM p GROUP BY 1 ORDER BY n_paths DESC, path ASC LIMIT 20
""",
    ),
    "behavior_attribution": (
        _attribution_fn,
        """
WITH t AS (SELECT user_id, event_type, value,
        last_value(CASE WHEN event_type IN ('view', 'click')
                        THEN event_type END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
    FROM events)
SELECT coalesce(channel, '(none)') AS channel,
       count(*)::BIGINT AS n_conversions,
       round(sum(value), 2) AS total_value
FROM t WHERE event_type = 'purchase' GROUP BY 1
""",
    ),
    "behavior_conversion_delay": (
        _conversion_delay_fn,
        """
WITH s AS (SELECT user_id,
        min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS sv
    FROM events GROUP BY 1),
e AS (SELECT ev.user_id, min(epoch_ns(ev.ts)) AS ep
      FROM events ev JOIN s USING (user_id)
      WHERE ev.event_type = 'purchase' AND epoch_ns(ev.ts) >= s.sv
      GROUP BY 1)
SELECT (ep - sv) // 86400000000000 AS delay_bucket,
       count(*)::BIGINT AS n_groups
FROM e JOIN s USING (user_id) GROUP BY 1
""",
    ),
    "behavior_retention_rates": (
        _retention_rates_fn,
        """
WITH act AS (SELECT DISTINCT user_id,
        epoch_ns(ts) - epoch_ns(ts) % 86400000000000 AS period FROM events),
coh AS (SELECT user_id, min(period) AS cohort FROM act GROUP BY 1),
j AS (SELECT act.user_id, act.period, coh.cohort,
             (act.period - coh.cohort) // 86400000000000 AS idx
      FROM act JOIN coh USING (user_id)),
pc AS (SELECT cohort,
        sum(CASE WHEN idx = 0 THEN 1 ELSE 0 END) AS n_groups,
        sum(CASE WHEN idx = 1 THEN 1 ELSE 0 END) AS n1,
        sum(CASE WHEN idx = 7 THEN 1 ELSE 0 END) AS n7
       FROM j GROUP BY 1)
SELECT cohort, CAST(n_groups AS BIGINT) AS n_groups,
       round(n1::DOUBLE / n_groups::DOUBLE, 6) AS rate_p1,
       round(n7::DOUBLE / n_groups::DOUBLE, 6) AS rate_p7
FROM pc
""",
    ),
    "behavior_funnel_step_timing": (
        _funnel_step_timing_fn,
        "WITH " + _SEQ_STEPS_SQL + """,
g AS (SELECT 1 AS step, epoch_ns(s1.t) - epoch_ns(s0.t) AS gap
      FROM s1 JOIN s0 USING (user_id)
      UNION ALL
      SELECT 2, epoch_ns(s2.t) - epoch_ns(s1.t)
      FROM s2 JOIN s1 USING (user_id))
SELECT step, count(*)::BIGINT AS n_groups,
       round(quantile_cont(gap, 0.5), 1) AS p50_gap_ns
FROM g GROUP BY 1
""",
    ),
    "behavior_session_funnel": (
        _session_funnel_fn,
        f"""
WITH s AS (SELECT user_id, ts, event_type,
  CASE WHEN lag(ts) OVER w IS NULL
       OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > {NANOS_2H} THEN 1 ELSE 0
  END AS ns
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s2 AS (SELECT user_id, ts, event_type,
  sum(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) - 1
    AS sidx FROM s),
a0 AS (SELECT user_id, sidx, min(ts) t FROM s2
       WHERE event_type = 'view' GROUP BY 1, 2),
a1 AS (SELECT e.user_id, e.sidx, min(e.ts) t FROM s2 e JOIN a0
       ON e.user_id = a0.user_id AND e.sidx = a0.sidx AND e.ts > a0.t
       WHERE e.event_type = 'purchase' GROUP BY 1, 2)
SELECT 0 AS step, 'view' AS step_type,
       (SELECT count(*) FROM a0)::BIGINT AS n_sessions
UNION ALL
SELECT 1, 'purchase', (SELECT count(*) FROM a1)::BIGINT
""",
    ),
    "behavior_session_funnel_bounded": (
        _session_funnel_bounded_fn,
        f"""
WITH s AS (SELECT user_id, ts, event_type,
  CASE WHEN lag(ts) OVER w IS NULL
       OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > {NANOS_2H} THEN 1 ELSE 0
  END AS ns
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s2 AS (SELECT user_id, ts, event_type,
  sum(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) - 1
    AS sidx FROM s),
a0 AS (SELECT user_id, sidx, min(ts) t FROM s2
       WHERE event_type = 'view' GROUP BY 1, 2),
-- rowFound:false step: sessions whose first view is followed by NO error
-- inside the maxDuration window; the anchor passes through unchanged
a1 AS (SELECT a0.user_id, a0.sidx, a0.t FROM a0 WHERE NOT EXISTS (
       SELECT 1 FROM s2 e WHERE e.user_id = a0.user_id AND e.sidx = a0.sidx
         AND e.event_type = 'error' AND e.ts > a0.t
         AND epoch_ns(e.ts) - epoch_ns(a0.t) <= {NANOS_30M})),
a2 AS (SELECT e.user_id, e.sidx, min(e.ts) t FROM s2 e JOIN a1
       ON e.user_id = a1.user_id AND e.sidx = a1.sidx AND e.ts > a1.t
       WHERE e.event_type = 'purchase'
         AND epoch_ns(e.ts) - epoch_ns(a1.t) <= {NANOS_30M} GROUP BY 1, 2)
SELECT 0 AS step, 'view' AS step_type,
       (SELECT count(*) FROM a0)::BIGINT AS n_sessions
UNION ALL
SELECT 1, 'error', (SELECT count(*) FROM a1)::BIGINT
UNION ALL
SELECT 2, 'purchase', (SELECT count(*) FROM a2)::BIGINT
""",
    ),
    # ---- OLAP breadth (windowed series / share / co-occurrence) ----------- #
    "olap_rolling_revenue": (
        _rolling_revenue_fn,
        """
WITH daily AS (SELECT date_trunc('day', o_orderdate) AS period_start,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          AS value
    FROM orders GROUP BY 1)
SELECT period_start, value,
       CAST(sum(value) OVER w AS BIGINT) AS rolling_sum,
       round(avg(value) OVER w, 4) AS rolling_avg
FROM daily
WINDOW w AS (ORDER BY date_diff('day', DATE '1970-01-01', period_start::DATE)
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
    ),
    "olap_nation_share": (
        _nation_share_fn,
        """
WITH j AS (SELECT r_name, n_name,
        CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey),
a AS (SELECT r_name, n_name, CAST(sum(cents) AS BIGINT) AS value
      FROM j GROUP BY 1, 2)
SELECT r_name, n_name, value,
       round(value::DOUBLE / (sum(value) OVER (PARTITION BY r_name))::DOUBLE,
             6) AS share
FROM a
""",
    ),
    "olap_basket_pairs": (
        _basket_pairs_fn,
        """
WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem)
SELECT a.i AS item_a, b.i AS item_b, count(*)::BIGINT AS n_baskets
FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
GROUP BY 1, 2 HAVING count(*) >= 2
ORDER BY n_baskets DESC, item_a ASC, item_b ASC LIMIT 50
""",
    ),
    "sample_mixture": (
        _mixture_sample_fn,
        _mixture_sql(),
    ),
    "sample_mixture_upsampled": (
        _mixture_upsample_fn,
        _mixture_upsample_sql(),
    ),
    "sample_dsir": (
        _dsir_fn,
        _DSIR_SQL,
    ),
    "resample_temperature": (
        _temperature_resample_fn,
        # same md5 gate as sample_deterministic; rate = sqrt(nmin/n) —
        # pow/sqrt/floor are correctly-rounded IEEE, so the kept set is
        # bit-identical across engines
        """
WITH c AS (SELECT lang, count(*)::BIGINT AS n_before FROM documents GROUP BY 1),
m AS (SELECT min(n_before) AS nmin FROM c),
k AS (SELECT d.lang, count(*)::BIGINT AS n_kept
      FROM documents d JOIN c ON d.lang = c.lang CROSS JOIN m
      WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 11))::BIGINT <
            floor(pow(nmin::DOUBLE / n_before::DOUBLE, 0.5) * 17592186044416)
      GROUP BY 1)
SELECT lang, n_before, coalesce(n_kept, 0)::BIGINT AS n_kept
FROM c LEFT JOIN k USING (lang)
""",
    ),
    "embedding_kmeans": (
        _kmeans_fn,
        "WITH " + _kmeans_cte_sql(8, 2) + """
SELECT g.ci::INT AS cluster, g.n_members::BIGINT AS n_members,
       round(sqrt(list_dot_product(c2.v, c2.v)), 6) AS centroid_norm
FROM (SELECT ci, count(*) AS n_members FROM af GROUP BY ci) g
JOIN c2 ON g.ci = c2.ci
""",
    ),
    "dedup_semantic": (
        _semantic_dedup_fn,
        "WITH " + _kmeans_cte_sql(8, 2) + """,
p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_dot_product(a.v, b.v) /
        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine_sim
  FROM af a JOIN af b ON a.ci = b.ci AND a.vec_id < b.vec_id)
SELECT id_a, id_b, cosine_sim FROM p WHERE cosine_sim >= 0.45
""",
    ),
    "decontaminate_bloom": (
        _bloom_decontaminate_fn,
        # identical result to decontaminate_ngram: bloom = prefilter only
        "WITH g AS (" + _GRAMS_SQL + """),
eg AS (SELECT DISTINCT unnest(gr) AS gram FROM g WHERE doc_id % 97 = 0),
cg AS (SELECT doc_id, unnest(gr) AS gram FROM g WHERE doc_id % 97 <> 0)
SELECT cg.doc_id, count(*)::BIGINT AS n_shared
FROM cg JOIN eg ON cg.gram = eg.gram GROUP BY cg.doc_id
""",
    ),
    "olap_top_supplier_per_part": (
        _top_supplier_per_part_fn,
        """
WITH ps AS (SELECT l_partkey, l_suppkey, sum(l_quantity) AS top_qty
            FROM lineitem WHERE l_partkey <= 100 GROUP BY 1, 2),
top AS (SELECT l_partkey, l_suppkey, top_qty FROM (
  SELECT *, row_number() OVER (PARTITION BY l_partkey
            ORDER BY top_qty DESC, l_suppkey) AS rk FROM ps) WHERE rk = 1)
SELECT p_partkey, p_name, s_name, top_qty
FROM top JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
""",
    ),
    "olap_pending_supply": (
        _pending_supply_fn,
        """
WITH gp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
sq AS (SELECT l_suppkey, sum(l_quantity) AS red_qty
       FROM lineitem JOIN gp ON l_partkey = p_partkey
       WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
       GROUP BY 1 HAVING sum(l_quantity) > 100)
SELECT s_name, n_name, red_qty
FROM sq JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
""",
    ),
    "olap_late_orders": (
        _late_orders_fn,
        """
WITH lo AS (SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
flag AS (SELECT l_orderkey, l_suppkey,
  max(CASE WHEN epoch_ns(l_shipdate) - epoch_ns(o_orderdate) > 31536000000000000
      THEN 1 ELSE 0 END) AS late FROM lo GROUP BY 1, 2),
agg AS (SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
        FROM flag GROUP BY 1)
SELECT s_name, count(*)::BIGINT AS numwait
FROM flag JOIN agg USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE late = 1 AND n_supp > 1 AND n_late = 1
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
""",
    ),
    "text_exact_substrings": (
        _exact_substring_fn,
        "WITH toks AS (" + _TOKS_SQL + "),\n" + _SUBSTR_SPANS_SQL + """
SELECT doc_id, min(start)::INT AS span_start, (max(start) + 19)::INT AS span_end,
       count(*)::BIGINT AS n_windows
FROM isl GROUP BY doc_id, island
""",
    ),
    "olap_sales_opportunity": (
        _sales_opportunity_fn,
        """
WITH ab AS (SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0)
SELECT n_name, count(*)::BIGINT AS n_custs,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_bal_cents
FROM customer JOIN nation ON c_nationkey = n_nationkey CROSS JOIN ab
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= '2000-01-01')
GROUP BY 1
""",
    ),
    "dedup_incremental_lsh": (
        _incremental_lsh_fn,
        # the full-corpus pair oracle restricted to pairs touching the
        # "new batch" slice — the defining property of the incremental run
        "SELECT * FROM (" + _MINHASH_PAIRS_SQL + """)
WHERE id_a % 5 = 0 OR id_b % 5 = 0
""",
    ),
    "curation_report": (
        _curation_report_fn,
        """
WITH pairs AS (""" + _MINHASH_PAIRS_SQL + """),
dup AS (SELECT DISTINCT id FROM (
  SELECT id_a AS id FROM pairs UNION ALL SELECT id_b AS id FROM pairs)),
qual AS (""" + _QUALITY_SQL + """),
cont AS (WITH g AS (""" + _grams_sql(5) + """),
  eg AS (SELECT DISTINCT unnest(gr) AS gram FROM g WHERE doc_id % 97 = 0),
  cg AS (SELECT doc_id, unnest(gr) AS gram FROM g WHERE doc_id % 97 <> 0)
  SELECT DISTINCT cg.doc_id FROM cg JOIN eg ON cg.gram = eg.gram)
SELECT source, count(*)::BIGINT AS n_docs,
       round(sum(CAST(round(quality * 1e6) AS BIGINT)) / count(*) / 1e6,
             4) AS mean_quality,
       CAST(count(*) FILTER (WHERE d.doc_id IN (SELECT id FROM dup))
            AS BIGINT) AS n_near_dup,
       CAST(count(*) FILTER (WHERE d.doc_id IN (SELECT doc_id FROM cont))
            AS BIGINT) AS n_contaminated
FROM documents d JOIN qual USING (doc_id)
WHERE d.doc_id % 97 <> 0
GROUP BY source
""",
    ),
    "interval_join_concurrent": (
        _interval_join_fn,
        f"""
WITH top AS (SELECT user_id FROM events
             GROUP BY 1 ORDER BY count(*) DESC, user_id LIMIT 20),
e AS (SELECT user_id, ts FROM events
      WHERE user_id IN (SELECT user_id FROM top)),
s AS (SELECT user_id, ts,
  CASE WHEN lag(ts) OVER w IS NULL
       OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > {NANOS_2H} THEN 1 ELSE 0
  END AS ns FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s2 AS (SELECT user_id, ts,
  sum(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) - 1
  AS idx FROM s),
sess AS (SELECT user_id, user_id || '#' || idx AS session_id,
         min(epoch_ns(ts)) AS sa, max(epoch_ns(ts)) + 1 AS ea
         FROM s2 GROUP BY 1, 2)
SELECT a.user_id AS user_a, a.session_id AS session_a,
       b.user_id AS user_b, b.session_id AS session_b,
       ((least(a.ea, b.ea) - greatest(a.sa, b.sa)) // 1000)::BIGINT
       AS overlap_us
FROM sess a JOIN sess b
ON a.user_id < b.user_id AND a.sa < b.ea AND b.sa < a.ea
""",
    ),
    "text_remove_dup_spans": (
        _remove_dup_spans_fn,
        "WITH toks AS (" + _TOKS_SQL + "),\n"
        "ctoks AS (SELECT doc_id, "
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk "
        "FROM documents),\n" + _SUBSTR_SPANS_SQL + """,
sp AS (SELECT doc_id, min(start) AS s, max(start) + 19 AS e
       FROM isl GROUP BY doc_id, island),
idx AS (SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS i
        FROM ctoks),
kept AS (SELECT idx.doc_id, idx.tok, idx.i
         FROM idx LEFT JOIN sp ON idx.doc_id = sp.doc_id
                              AND idx.i >= sp.s AND idx.i <= sp.e
         WHERE sp.doc_id IS NULL),
agg AS (SELECT doc_id,
        array_to_string(list(tok ORDER BY i), ' ') AS clean_text,
        count(*) AS n_kept FROM kept GROUP BY doc_id)
SELECT t.doc_id, coalesce(agg.clean_text, '') AS clean_text,
       (len(t.tk) - coalesce(agg.n_kept, 0))::INT AS n_removed_tokens
FROM toks t LEFT JOIN agg ON t.doc_id = agg.doc_id
""",
    ),
    "heavy_hitters_props": (
        _heavy_hitters_fn,
        """
SELECT props AS value, count(*)::BIGINT AS cnt FROM events
WHERE props IS NOT NULL
GROUP BY 1 ORDER BY cnt DESC, value LIMIT 10
""",
    ),
    "sample_splits": (
        _sample_splits_fn,
        # interval layout sorted by split name: test < train < val
        """
WITH b AS (SELECT lang,
  ('0x' || substr(md5(doc_id::VARCHAR), 1, 11))::BIGINT AS bucket
  FROM documents)
SELECT lang,
  CASE WHEN bucket < floor(0.05 * 17592186044416) THEN 'test'
       WHEN bucket < floor(0.95 * 17592186044416) THEN 'train'
       ELSE 'val' END AS split,
  count(*)::BIGINT AS n_docs
FROM b GROUP BY 1, 2
""",
    ),
    "text_classifier_score": (
        _classifier_score_fn,
        # same md5-derived pseudo-weights: w(tok) in [-1, 1] / 1000 steps
        """
WITH toks AS (""" + _TOKS_SQL + """)
SELECT doc_id, round(1.0 / (1.0 + exp(-(
  coalesce(list_sum(list_transform(tk, t ->
    ((('0x' || substr(md5('w' || t), 1, 8))::BIGINT % 2001) - 1000) / 1000.0)),
    0.0)
  / greatest(len(tk), 1)))), 6) AS clf_score
FROM toks
""",
    ),
    "text_classifier_trained": (
        _classifier_trained_fn,
        _trained_weights_sql(),
    ),
    "text_gopher_filter": (
        _gopher_filter_fn,
        """
WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
b AS (SELECT doc_id, text,
  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words,
  list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS lines,
  list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tk
  FROM d),
m AS (SELECT doc_id,
  len(words)::INT AS n_words,
  round(length(regexp_replace(text, '\\s', '', 'g'))::DOUBLE
        / greatest(len(words), 1), 6) AS mean_word_len,
  round(((length(text) - length(replace(text, '#', '')))
         + (length(text) - length(replace(text, '...', ''))) / 3
         + (length(text) - length(replace(text, '…', ''))))
        / greatest(len(words), 1), 6) AS symbol_word_ratio,
  round(len(list_filter(lines, l ->
          substr(ltrim(l), 1, 1) = '•' OR substr(ltrim(l), 1, 1) = '-'
          OR substr(ltrim(l), 1, 1) = '*'))::DOUBLE
        / greatest(len(lines), 1), 6) AS bullet_line_frac,
  round(len(list_filter(lines, l ->
          ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…')))::DOUBLE
        / greatest(len(lines), 1), 6) AS ellipsis_line_frac,
  round(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
        / greatest(len(words), 1), 6) AS alpha_word_frac,
  len(list_intersect(tk, ['the','be','to','of','and','that','have','with']
      ))::INT AS stopword_hits
  FROM b)
SELECT doc_id, n_words, mean_word_len, symbol_word_ratio, bullet_line_frac,
  ellipsis_line_frac, alpha_word_frac, stopword_hits,
  (n_words >= 20 AND n_words <= 100000) AS rule_word_count,
  (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS rule_mean_word_len,
  (symbol_word_ratio <= 0.1) AS rule_symbol_ratio,
  (bullet_line_frac <= 0.9) AS rule_bullet_lines,
  (ellipsis_line_frac <= 0.3) AS rule_ellipsis_lines,
  (alpha_word_frac >= 0.8) AS rule_alpha_words,
  (stopword_hits >= 1) AS rule_stopwords,
  (n_words >= 20 AND n_words <= 100000
   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
   AND symbol_word_ratio <= 0.1 AND bullet_line_frac <= 0.9
   AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
   AND stopword_hits >= 1) AS passes
FROM m
""",
    ),
    "text_c4_clean": (
        _c4_clean_fn,
        """
WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
b AS (SELECT doc_id,
  list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS lines
  FROM d),
k AS (SELECT doc_id, lines,
  list_filter(lines, l ->
    len(list_filter(string_split_regex(trim(l), '\\s+'), x -> x <> '')) >= 12
    AND NOT contains(lower(trim(l)), 'javascript')
    AND NOT contains(lower(trim(l)), 'lorem ipsum')
    AND NOT contains(lower(trim(l)), 'cookie')) AS kept
  FROM b)
SELECT doc_id,
  coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
  len(lines)::INT AS n_lines, len(kept)::INT AS n_kept
FROM k
""",
    ),
    "text_train_perceptron": (
        _train_perceptron_fn,
        _perceptron_sql(),
    ),
    "text_tokens_bpe": (
        _bpe_tokens_fn,
        _bpe_oracle_sql(_BPE_MERGES),
    ),
    "text_bpe_learned": (
        _bpe_learned_fn,
        _bpe_learn_oracle_sql(_BPE_LEARN_N),
    ),
    "text_lm_nll": (
        _lm_nll_fn,
        _LM_NLL_SQL,
    ),
    "text_lm_nll_join": (
        _lm_nll_join_fn,
        _lm_nll_sql(_LM_JOIN_NB, _LM_JOIN_TB),
    ),
    "text_lm_nll_frames": (
        _lm_nll_frames_fn,
        _lm_nll_sql(_LM_FRAMES_NB, _LM_FRAMES_TB),
    ),
    "behavior_funnel_trend": (
        _funnel_trend_fn,
        f"""
WITH u AS (SELECT user_id,
    min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS fv
  FROM events GROUP BY 1),
c AS (SELECT u.user_id, u.fv,
    max(CASE WHEN e.event_type = 'purchase' AND epoch_ns(e.ts) > u.fv
        THEN 1 ELSE 0 END) AS cv
  FROM u JOIN events e USING (user_id)
  WHERE u.fv IS NOT NULL GROUP BY 1, 2)
SELECT (fv // {NANOS_DAY})::BIGINT AS day_idx,
  count(*)::BIGINT AS n_started, sum(cv)::BIGINT AS n_converted,
  round(sum(cv)::DOUBLE / count(*), 6) AS conv_rate
FROM c GROUP BY 1
""",
    ),
    # Self-certifying oracles: the engine asserts its own approximation
    # guarantee in-plan (GK rank bracket / ANN recall floor) and the SQL
    # side enumerates the expected all-true verdict rows — converting two
    # formerly rows-only entries into full hash checks.
    "olap_percentiles_approx": (
        _olap_percentiles_approx_fn,
        """
SELECT l_returnflag, p AS percentile, true AS within_bound
FROM (SELECT DISTINCT l_returnflag FROM lineitem)
CROSS JOIN (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.95 AS DOUBLE))) t(p)
""",
    ),
    "olap_percentiles_approx_sketch": (
        _olap_percentiles_sketch_cert_fn,
        """
SELECT l_returnflag, p AS percentile, true AS within_rel_err
FROM (SELECT DISTINCT l_returnflag FROM lineitem)
CROSS JOIN (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.95 AS DOUBLE))) t(p)
""",
    ),
    "ann_ivf_topk": (
        _ann_ivf_fn,
        """
SELECT vec_id AS query_id, 10::BIGINT AS n_returned, true AS recall_ok
FROM embeddings WHERE vec_id < 5
""",
    ),
    "ann_ivf_persisted": (
        _ann_ivf_persisted_fn,
        """
SELECT vec_id AS query_id, 10::BIGINT AS n_returned, true AS recall_ok
FROM embeddings WHERE vec_id < 5
""",
    ),
    "ann_ivfpq_topk": (
        _ann_ivfpq_fn,
        """
SELECT vec_id AS query_id, 10::BIGINT AS n_returned, true AS recall_ok
FROM embeddings WHERE vec_id < 5
""",
    ),
    "retrieval_stage": (
        _retrieval_stage_fn,
        """
SELECT vec_id AS query_id, 10::BIGINT AS n_returned, true AS recall_ok
FROM embeddings WHERE vec_id < 5
""",
    ),
    "fr_agg_groups_per_value_approx": (
        _fr_groups_approx_fn,
        """
SELECT event_type AS value, true AS within_tol
FROM events GROUP BY 1
""",
    ),
}

# Queries with no SQL-expressible oracle (driver records rows-only check):
# empty since round 4 — the last two entries (ann_ivf_topk, this one)
# gained self-certifying contracts.
NO_ORACLE: dict = {}


# The driver's correctness gate audits the FIRST 50 entries of queries().
# Round 2 verified the 50 reference-shaped queries; round 3 rotated the 37
# then-unaudited extension queries; round 4 closed the audit debt (every
# catalog query now has a green driver row in some round; r4's window was
# 50/50 green). Round 5's window leads with every query whose CODE PATH
# changed this round: the contamination hash tier (decontaminate_ngram and
# both pipeline composites), the fused incremental-LSH candidate join, the
# sampled/vectorized IVF-PQ build, the persist-ring rewrite (everything
# that shingles), and the null-text classifier coalesce. Then the fr_*
# reference suite re-anchors, then extension re-greens in family order.
# Everything else follows in catalog order, so all 124 stay runnable.
_DRIVER_PRIORITY = [
    # r12 window head: the two NEW queries needing their first driver
    # green — the staged persisted-IVF retrieval report and the
    # declared bucketBy(group)+sortBy(group, ts) layout path (window
    # anchors sort-free off the scan; engine prefers the window row
    # universe unconditionally on such layouts — both r12)
    "retrieval_stage", "fr_sequence_sorted_layout",
    # the full r9-stale block (39 queries — after r11 the union
    # staleness histogram was r9=39, r10=42, r11=50; this window
    # absorbs ALL of r9, moving the floor to r10). Several of these
    # also share the r12-changed engine.run universe selection
    # (sorted-layout branch threaded through every aggregation/funnel
    # run) and the registration premium calibration.
    "ann_ivf_topk", "asof_join_clicks", "audience_segments",
    "behavior_funnel_trend", "dedup_exact", "dedup_incremental_lsh",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_pipeline_minhash",
    "dedup_semantic", "dedup_simhash", "embedding_kmeans",
    "fr_agg_count_per_value", "fr_agg_groups_per_value",
    "fr_agg_mean_per_value", "fr_agg_sum_per_value", "fr_funnel_step_agg",
    "fr_regex_filter", "fr_string_ops", "fr_timeframe",
    "heavy_hitters_props", "interval_join_concurrent",
    "multimodal_features_png", "olap_pending_supply",
    "olap_percentiles_approx", "olap_pricing_summary", "olap_promo_share",
    "olap_rolling_revenue", "olap_sales_opportunity",
    "olap_top_supplier_per_part", "sample_group_cap", "sample_splits",
    "sessionize_events", "text_classifier_score",
    "text_classifier_trained", "text_lm_nll", "text_lm_nll_frames",
    "text_lm_nll_join", "time_rollup_daily",
    # registration profiling gained the premium-calibration fields
    # (catalog.measure_segmented_premium) this round
    "fr_registration_profile",
    # the remaining 8 slots start on the r10 block (all equally stale;
    # heavy plans first so regressions surface where they cost most)
    "ann_cosine_topk", "ann_ivf_fullprobe", "ann_ivfpq_topk",
    "ann_lsh_bucketed", "olap_percentiles", "olap_basket_pairs",
    "olap_join_chain", "olap_top_orders",
]
# Audit ledger after this rotation: after r11 the staleness histogram
# was r9=39, r10=42, r11=50 (union over CORRECTNESS_r01-r11). The r12
# window first-greens the two NEW queries (retrieval_stage,
# fr_sequence_sorted_layout), absorbs the ENTIRE r9 block (39), and
# starts on r10 — after r12 nothing should be staler than r10.
# Everything else stays runnable after the window and is
# value-verified every round by the pytest oracle-parity sweep over
# all 133.

def queries() -> dict:
    out = {name: fn for name, (fn, _sql) in QUERIES.items()}
    out.update(NO_ORACLE)
    ordered = {k: out[k] for k in _DRIVER_PRIORITY if k in out}
    ordered.update({k: v for k, v in out.items() if k not in ordered})
    return ordered


# Timing-only OVERRIDES for bench.py. A variant times the OPERATOR as a
# user would run it, when the catalog entry deliberately carries extra
# in-plan verification work (self-certifying approximation contracts).
# Since round 7 the sketch twin ALSO lives in QUERIES (same name, with a
# certification wrapper) so the driver correctness-gates the sketch's
# values every round — bench.py applies this dict LAST so the published
# timing still measures the sketch-only plan, and the certified catalog
# fn documents exactly which aggregate it certifies. The full
# `olap_percentiles_approx` rank-bracket query keeps its own independent
# timing + correctness rows as before.
BENCH_VARIANTS: dict = {
    "olap_percentiles_approx_sketch": _olap_percentiles_sketch_only_fn,
}

# Queries whose FIRST bench run builds a persisted fixture (a parquet
# band-table index) that later runs reuse: bench.py splits their
# first-run time (fixture build + probe) from the steady-state probe in
# BENCH_DETAIL's "fixture_splits", so the round-over-round trend tracks
# the OPERATOR (probe), not the fixture build. The headline min-of-N
# already reflects probe (the build run never wins the min).
FIXTURE_AMORTIZED = ["dedup_incremental_lsh", "ann_ivf_persisted",
                     "retrieval_stage", "fr_sequence_sorted_layout"]


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (fn, sql) in QUERIES.items() if sql is not None}
