#!/usr/bin/env python
"""Scale sanity check: synthesize an N-row event stream (default 10M rows,
~1M groups — 100× the sf0.1 bench table), write it as parquet, and time
the core engine paths plus the round-2 behavioral operators on it.

Not part of the driver gates — this is the "would the plan survive a
100× scale-up" experiment run locally: per-query wall time should grow
~linearly with rows while plan shapes stay identical (the plan gates in
tests/test_plans.py pin the shapes; this script pins the slope).

Usage: python tools/scale_check.py [n_rows] [n_groups]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from funnel_rocket_spark import benchqueries as bq  # noqa: E402
from funnel_rocket_spark.engine import QueryEngine  # noqa: E402
from funnel_rocket_spark.operators import behavior, temporal  # noqa: E402
from funnel_rocket_spark.session import get_spark  # noqa: E402

NANOS_DAY = 86_400_000_000_000


def synthesize(spark, n_rows: int, n_groups: int, path: str) -> None:
    """Deterministic event stream: hash-derived users/types/values, 90
    days of activity. xxhash64 is fine here — no cross-engine oracle,
    just volume."""
    types = F.array(*[F.lit(t) for t in
                      ("view", "view", "view", "click", "click",
                       "purchase", "signup", "error")])
    df = (
        spark.range(n_rows)
        .withColumn("user_id", F.pmod(F.xxhash64("id"), F.lit(n_groups)))
        .withColumn("ts", (F.lit(1_700_000_000_000_000_000)
                           + F.pmod(F.xxhash64("id", F.lit(1)),
                                    F.lit(90 * NANOS_DAY))))
        .withColumn("event_type",
                    types[F.pmod(F.xxhash64("id", F.lit(2)), F.lit(8))
                          .cast("int")])
        .withColumn("value",
                    (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100_000))
                     / 100.0))
        .withColumnRenamed("id", "event_id")
    )
    df.write.mode("overwrite").parquet(path)


def synthesize_docs(spark, n_docs: int, path: str) -> None:
    """Synthetic corpus with planted near-duplicates: every 20th doc is
    its predecessor's text plus one extra token (Jaccard ≈ 0.98 on
    3-gram shingles). 60-140 tokens/doc from a 10k-word vocabulary."""
    base = F.when(F.pmod("id", F.lit(20)) == 0, F.col("id") - 1) \
        .otherwise(F.col("id"))
    n_tokens = (F.pmod(F.xxhash64(base, F.lit(7)), F.lit(80)) + 60)
    words = F.transform(
        F.sequence(F.lit(1), n_tokens.cast("int")),
        lambda i: F.concat(F.lit("w"), F.pmod(
            F.xxhash64(base, i.cast("long")), F.lit(10_000)).cast("string")))
    text = F.when(
        F.pmod("id", F.lit(20)) == 0,
        F.concat_ws(" ", F.concat_ws(" ", words), F.lit("wextra")),
    ).otherwise(F.concat_ws(" ", words))
    (spark.range(n_docs)
     .select(F.col("id").alias("doc_id"), text.alias("text"))
     .write.mode("overwrite").parquet(path))


def docs_main(n_docs: int) -> None:
    """Corpus-scale dedup check: minhash LSH pairs + end-to-end survivor
    filter on n_docs synthetic documents (sf0.1's table is 5k docs —
    this is the 20-100× version)."""
    from funnel_rocket_spark.operators import dedup

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, ".scratch", f"docs_{n_docs}.parquet")
    spark = get_spark(app_name="scale-check-docs")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(path):
        t0 = time.perf_counter()
        synthesize_docs(spark, n_docs, path)
        print(f"# synthesized {n_docs} docs in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    docs = spark.read.parquet(path)

    out = {"n_docs": n_docs, "timings": {}}
    t0 = time.perf_counter()
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=8, n=3,
                                    threshold=0.5)
    n_pairs = pairs.count()
    out["timings"]["minhash_lsh_pairs"] = round(time.perf_counter() - t0, 2)
    out["n_pairs"] = n_pairs

    t0 = time.perf_counter()
    survivors = dedup.apply_dedup(docs, pairs, id_col="doc_id").count()
    out["timings"]["apply_dedup"] = round(time.perf_counter() - t0, 2)
    out["n_survivors"] = survivors
    # planted dups: ids 20, 40, ... (n_docs // 20 of them, minus id 0's
    # non-existent predecessor handled by base clamp at id -1? id 0 is not
    # a dup since 0 % 20 == 0 maps to base -1 → range() has no -1, but
    # xxhash64(-1) still yields a valid unique text) — expect ≈ n_docs/20
    # pairs and ≈ n_docs - n_docs/20 survivors
    print(json.dumps(out))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "docs":
        docs_main(int(sys.argv[2]) if len(sys.argv) > 2 else 100_000)
        return
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_groups = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, ".scratch", f"events_{n_rows}.parquet")

    spark = get_spark(app_name="scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(path):
        t0 = time.perf_counter()
        synthesize(spark, n_rows, n_groups, path)
        print(f"# synthesized {n_rows} rows in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    ev = spark.read.parquet(path)
    eng = QueryEngine("user_id", "ts")

    queries = {
        "empty_counts": lambda: eng.run(ev, {}),
        "count_target": lambda: eng.run(ev, {"query": {"conditions": [
            {"filter": ["event_type", "==", "purchase"],
             "target": ["count", ">=", 3]}]}}),
        "sequence_3step": lambda: eng.run(ev, {"query": {"conditions": [
            {"sequence": [{"filter": ["event_type", "==", "signup"]},
                          {"filter": ["event_type", "==", "click"]},
                          {"filter": ["event_type", "==", "purchase"]}]}]}}),
        "funnel_steps": lambda: eng.plan(ev, {"funnel": {"sequence": [
            {"filter": ["event_type", "==", "view"]},
            {"filter": ["event_type", "==", "purchase"]}]}})
            .funnel_step_counts().collect(),
        "agg_count_per_value": lambda: eng.run(ev, {"query": {
            "conditions": [{"filter": ["event_type", "==", "purchase"]}],
            "aggregations": [{"column": "event_type",
                              "type": "countPerValue", "top": 10}]}}),
        "retention_weekly": lambda: behavior.retention_cohorts(
            ev.select("user_id", "ts"), "user_id", "ts").collect(),
        "attribution": lambda: behavior.last_touch_attribution(
            ev, "user_id", "ts", "event_type", conversion="purchase",
            touch_types=["view", "click"], value_col="value",
            order_col="event_id").collect(),
        "sessionize_stats": lambda: temporal.session_stats(
            ev.select("user_id", "ts"), "user_id", "ts",
            gap=2 * 3600 * 10**9)
            .groupBy().agg(F.count(F.lit(1)), F.sum("n_events")).collect(),
    }

    out = {"n_rows": n_rows, "n_groups": n_groups, "timings": {}}
    for name, fn in queries.items():
        fn()  # warm (codegen + page cache)
        t0 = time.perf_counter()
        fn()
        out["timings"][name] = round(time.perf_counter() - t0, 2)
        print(f"# {name}: {out['timings'][name]}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
