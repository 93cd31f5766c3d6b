"""dedup_clusters / apply_dedup: connected components + survivor filtering."""

from pyspark.sql import functions as F

from funnel_rocket_spark.operators import dedup


def test_dedup_clusters_transitive(spark):
    # components: {1,2,3,4} (chain), {10,11}, singleton edge-less 99 untouched
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long")
    clusters = {r["id"]: r["cluster"]
                for r in dedup.dedup_clusters(pairs).collect()}
    assert clusters == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_apply_dedup_keeps_survivors(spark):
    docs = spark.range(6).select(F.col("id").alias("doc_id"),
                                 F.concat(F.lit("d"), "id").alias("text"))
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)],
                                  "id_a long, id_b long")
    kept = sorted(r["doc_id"] for r in
                  dedup.apply_dedup(docs, pairs).collect())
    # cluster {0,1,2} -> keep 0; cluster {4,5} -> keep 4; 3 untouched
    assert kept == [0, 3, 4]


def test_end_to_end_minhash_then_apply(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    deduped = dedup.apply_dedup(docs, pairs)
    n_docs = docs.count()
    n_pairs = pairs.count()
    n_kept = deduped.count()
    assert n_kept < n_docs  # some near-dups exist in the corpus
    assert n_kept >= n_docs - n_pairs  # can't drop more than pair count

def test_star_handles_long_chain(spark):
    """A 64-node chain has diameter 63 — label propagation's worst case.
    Large-star/small-star must still collapse it to one cluster within the
    default iteration budget (O(log n) rounds)."""
    pairs = spark.createDataFrame([(i, i + 1) for i in range(63)],
                                  "id_a long, id_b long")
    clusters = {r["id"]: r["cluster"]
                for r in dedup.dedup_clusters(pairs).collect()}
    assert clusters == {i: 0 for i in range(64)}


def test_star_agrees_with_propagation(spark):
    """Differential check on a pseudo-random multi-component graph."""
    import random

    rnd = random.Random(7)
    edges = {(rnd.randrange(0, 120), rnd.randrange(0, 120)) for _ in range(90)}
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    star = {r["id"]: r["cluster"]
            for r in dedup.dedup_clusters(pairs, algorithm="star").collect()}
    prop = {r["id"]: r["cluster"]
            for r in dedup.dedup_clusters(pairs, max_iterations=120,
                                          algorithm="propagate").collect()}
    assert star == prop


def test_star_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.dedup_clusters(pairs).count() == 0


def test_simhash_table_matches_column_version(spark):
    """simhash16_table is the throughput shape of simhash16 — bit-identical,
    including empty/whitespace/null documents (simhash 0)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text").unionByName(spark.createDataFrame(
            [(9001, ""), (9002, "   "), (9003, None)],
            "doc_id long, text string"))
    col_ver = {r["doc_id"]: r["simhash"] for r in docs.select(
        "doc_id",
        dedup.simhash16(F.col("text")).cast("bigint").alias("simhash"),
    ).collect()}
    tab_ver = {r["doc_id"]: r["simhash"]
               for r in dedup.simhash16_table(docs).collect()}
    assert tab_ver == col_ver
    assert tab_ver[9001] == tab_ver[9002] == tab_ver[9003] == 0


def test_ngram_contamination_semantics_and_broadcast(spark):
    """Known overlaps on hand-built docs; the eval gram set must broadcast
    (corpus grams never shuffle for the join — the 100 TB shape)."""
    from funnel_rocket_spark.plans import formatted_plan

    corpus = spark.createDataFrame(
        [(1, "the cat sat on the mat today"),   # shares "the cat sat", "cat sat on", ...
         (2, "dogs bark loudly at night"),      # no overlap
         (3, "on the mat today we rest")],      # shares "on the mat", "the mat today"
        "doc_id long, text string")
    evalset = spark.createDataFrame(
        [(100, "the cat sat on the mat today")], "doc_id long, text string")
    out = {r["doc_id"]: r["n_shared"]
           for r in dedup.ngram_contamination(corpus, evalset, n=3).collect()}
    # doc 1 == eval doc: all 5 of its distinct 3-grams shared; doc 3 shares
    # "on the mat" and "the mat today"; doc 2 absent entirely
    assert out == {1: 5, 3: 2}
    plan = formatted_plan(dedup.ngram_contamination(corpus, evalset, n=3))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_ngram_contamination_planner_fallback_equal(spark, monkeypatch):
    """The auto guard's fallback (eval gram set beyond the broadcast cap —
    found by the 2M-doc rung OOMing a heap-starved JVM) drops the forced
    hint and lets the planner size the join; results are identical, and
    auto actually routes there when the cap is exceeded. (On a toy eval
    set the planner still broadcasts by its own stats — the point is that
    nothing FORCES a multi-GB broadcast.)"""
    corpus = spark.createDataFrame(
        [(1, "the cat sat on the mat today"),
         (2, "dogs bark loudly at night"),
         (3, "on the mat today we rest")],
        "doc_id long, text string")
    evalset = spark.createDataFrame(
        [(100, "the cat sat on the mat today")], "doc_id long, text string")
    want = {1: 5, 3: 2}
    unhinted = {r["doc_id"]: r["n_shared"]
                for r in dedup.ngram_contamination(
                    corpus, evalset, n=3, strategy="planner").collect()}
    assert unhinted == want
    monkeypatch.setattr(dedup, "_CONTAMINATION_BROADCAST_MAX", 2)
    auto = {r["doc_id"]: r["n_shared"]
            for r in dedup.ngram_contamination(
                corpus, evalset, n=3).collect()}
    assert auto == want  # routed through the fallback, same answer


def test_bounded_persist_ring_caps_storage(spark):
    """The persist ring keeps at most CAP frames cached; older frames are
    unpersisted so a long-lived session (job server, the 109-query bench)
    can't accumulate storage without bound."""
    frames = [spark.range(i + 1) for i in range(dedup._PERSISTED_RING_CAP + 3)]
    for f in frames:
        dedup.bounded_persist(f)
    assert len(dedup._PERSISTED_RING) == dedup._PERSISTED_RING_CAP
    assert not frames[0].storageLevel.useMemory    # evicted + unpersisted
    assert not frames[1].storageLevel.useMemory
    assert frames[-1].storageLevel.useMemory       # recent stays cached


def test_bounded_persist_plan_identical_frames_share_one_slot(spark):
    """REGRESSION (round-4 perf defect): Spark's CacheManager dedupes
    cached entries by canonicalized plan, so unpersisting ANY
    plan-identical handle drops the shared entry. The old handle-keyed
    FIFO evicted the entry out from under still-running composed queries
    (dedup_pipeline_minhash 2.80→1.53 s once fixed). Now plan-identical
    re-persists refresh ONE ring slot: flooding the ring with copies of
    the same plan must never evict that plan, and the first handle stays
    cached throughout."""
    base = spark.range(0, 1000).selectExpr("id", "id * 2 as v")
    first = dedup.bounded_persist(base.filter("v % 4 = 0"))
    assert first.storageLevel.useMemory
    # Interleave: many plan-identical persists (fresh handles, same plan)
    # plus a few distinct plans — far more appends than the old cap.
    for i in range(dedup._PERSISTED_RING_CAP * 2):
        same_plan = base.filter("v % 4 = 0")          # fresh handle
        dedup.bounded_persist(same_plan)
        dedup.bounded_persist(spark.range(10_000 + i))  # distinct plan
    assert first.storageLevel.useMemory, \
        "plan-identical re-persist evicted the shared cache entry"
    # And only ONE ring slot is spent on that plan.
    same_slots = sum(1 for _, f in dedup._PERSISTED_RING
                     if f.sameSemantics(first))
    assert same_slots == 1


def test_bounded_persist_recovers_from_external_clear(spark):
    """bench.py calls spark.catalog.clearCache() between runs; the ring
    must detect the externally-dropped entry and re-persist rather than
    trusting its stale handle."""
    plan = spark.range(0, 500).selectExpr("id % 7 as k")
    dedup.bounded_persist(plan)
    spark.catalog.clearCache()
    again = dedup.bounded_persist(spark.range(0, 500).selectExpr("id % 7 as k"))
    assert again.storageLevel.useMemory


def test_ngram_contamination_all_strategies_agree(spark):
    """broadcast / hash / planner tiers are the same function; the hash
    tier (broadcast xxhash64 set + map-side semi join + exact verify of
    survivors) must change the answer by exactly nothing."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter("doc_id % 7 != 0")
    evalset = docs.filter("doc_id % 7 = 0")
    results = {}
    for strat in ("broadcast", "hash", "planner"):
        results[strat] = sorted(map(tuple, dedup.ngram_contamination(
            corpus, evalset, n=3, strategy=strat).collect()))
    assert results["broadcast"] == results["hash"] == results["planner"]
    assert len(results["hash"]) > 0


def test_ngram_contamination_hash_tier_plan(spark):
    """Hash tier plan shape: the corpus grams meet a broadcast LEFT SEMI
    hash join (zero corpus shuffle) before any string-equality join."""
    from funnel_rocket_spark.plans import formatted_plan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter("doc_id % 7 != 0")
    evalset = docs.filter("doc_id % 7 = 0")
    plan = formatted_plan(dedup.ngram_contamination(
        corpus, evalset, n=3, strategy="hash"))
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan, plan


def test_minhash_verify_modes_identical(spark):
    """The two verification shapes (cached corpus grams vs
    candidate-only re-shingle) are a pure execution choice — pair sets
    and jaccard values must be identical, and 'auto' must route a
    footer-boundable small scan to 'cached'."""
    import pytest

    from funnel_rocket_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def run(mode):
        return sorted(map(tuple, dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", threshold=0.3,
            verify_mode=mode).collect()))

    cached, cands = run("cached"), run("candidates")
    assert cached == cands and len(cached) > 0
    assert run("auto") == cached

    # the 500-row parquet is footer-boundable and small -> auto = cached
    from funnel_rocket_spark.operators.similarity import (
        _scan_rowcount_upper_bound)
    bound = _scan_rowcount_upper_bound(docs)
    assert bound is not None and bound <= dedup._VERIFY_CACHED_MAX_ROWS

    # a union-shaped plan is NOT footer-boundable (inputFiles dedupes
    # paths, so a self-union would under-count) -> auto = candidates
    # (still identical values; the 0-row arm changes nothing)
    unioned = docs.unionByName(docs.limit(0))
    assert _scan_rowcount_upper_bound(unioned) is None
    got = sorted(map(tuple, dedup.minhash_lsh_pairs(
        unioned, "text", "doc_id", threshold=0.3).collect()))
    assert got == cached

    with pytest.raises(ValueError, match="verify_mode"):
        dedup.minhash_lsh_pairs(docs, verify_mode="nope")
