"""IVF approximate search: full-probe must reduce to exact brute force;
partial probe recall tracks the probed share."""

from pyspark.sql import functions as F

from funnel_rocket_spark import benchqueries as bq
from funnel_rocket_spark.operators import similarity


def _result_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def test_ivf_full_probe_equals_exact(spark):
    """n_probe == n_clusters degenerates to brute force — the IVF machinery
    (index build, probe routing, per-cell scoring, global rank) must then
    reproduce the exact top-k identically."""
    emb = bq.load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    queries = emb.filter(F.col("vec_id") < 5)
    exact = _result_sets(similarity.cosine_topk(emb, queries, k=10))
    full = _result_sets(similarity.ivf_topk(emb, queries, k=10,
                                            n_clusters=8, n_probe=8))
    assert full == exact


def test_ivf_partial_probe_sane(spark):
    """Probing half the cells on near-uniform vectors: recall must be at
    least the probed share (routing to NEAREST cells can only beat random
    cell choice) and results must still be valid size-k sets."""
    emb = bq.load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    queries = emb.filter(F.col("vec_id") < 5)
    exact = _result_sets(similarity.cosine_topk(emb, queries, k=10))
    approx = _result_sets(similarity.ivf_topk(emb, queries, k=10,
                                              n_clusters=8, n_probe=4))
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q])
               for q in exact]
    assert sum(recalls) / len(recalls) >= 0.4, recalls
    for ids in approx.values():
        assert len(ids) == 10


def test_ivf_index_reuse(spark, tmp_path):
    """The index round-trips through parquet (the production path: build
    once, write partitioned by cell, search many times)."""
    emb = bq.load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    queries = emb.filter(F.col("vec_id") < 3)
    assigned, centers = similarity.ivf_index(emb, n_clusters=8)
    direct = _result_sets(similarity.ivf_search(assigned, centers, queries,
                                                k=5, n_probe=8))
    path = str(tmp_path / "ivf_index")
    assigned.write.partitionBy("__cell").parquet(path)
    loaded = spark.read.parquet(path)
    reloaded = _result_sets(similarity.ivf_search(loaded, centers, queries,
                                                  k=5, n_probe=8))
    assert direct == reloaded


def test_ivf_save_load_and_pruned_search(spark, tmp_path):
    """r11 persistence surface: save_ivf_index/load_ivf_index round-trip
    (crash-safe: a directory without centers.json is refused), and
    prune_cells=True returns IDENTICAL results while the physical scan
    carries a partition filter on __cell — on the cell-partitioned
    layout, unprobed cells are never read."""
    import pytest as _pytest

    emb = bq.load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    queries = emb.filter(F.col("vec_id") < 3)
    assigned, centers = similarity.ivf_index(emb, n_clusters=8)
    direct = _result_sets(similarity.ivf_search(assigned, centers, queries,
                                                k=5, n_probe=2))
    path = str(tmp_path / "idx")
    similarity.save_ivf_index(assigned, centers, path)
    loaded, centers2 = similarity.load_ivf_index(spark, path)
    assert [[round(x, 9) for x in c] for c in centers2] == \
        [[round(float(x), 9) for x in c] for c in centers]
    pruned_df = similarity.ivf_search(loaded, centers2, queries,
                                      k=5, n_probe=2, prune_cells=True)
    assert _result_sets(pruned_df) == direct
    # the probe's cell set must reach the SCAN as a partition filter —
    # Spark applies PartitionFilters at file listing, so unprobed cells'
    # files are never opened (inputFiles() can't show this: it reports
    # the relation's full file list, filters ignored)
    plan = pruned_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__cell" in plan.split(
        "PartitionFilters", 1)[1][:200], plan[:2000]
    # incomplete index (no centers.json) refused loudly
    (tmp_path / "bad").mkdir()
    with _pytest.raises(ValueError, match="centers.json"):
        similarity.load_ivf_index(spark, str(tmp_path / "bad"))


def test_embedding_dup_methods_agree(spark):
    """The numpy-GEMM path and the pure-Column-expression path are
    independent implementations of the same operator — pin them together."""
    from funnel_rocket_spark import benchqueries as bq
    from funnel_rocket_spark.operators import similarity
    from pyspark.sql import functions as F

    emb = bq.load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    fast = {(r["id_a"], r["id_b"]): r["cosine_sim"]
            for r in similarity.embedding_dup_pairs(emb, 0.45).collect()}
    slow = {(r["id_a"], r["id_b"]): r["cosine_sim"]
            for r in similarity.embedding_dup_pairs(
                emb, 0.45, method="expr").collect()}
    assert fast.keys() == slow.keys() and len(fast) > 0
    for k in fast:
        assert abs(fast[k] - slow[k]) < 1e-9


def test_embedding_dup_auto_routes_to_lsh(spark, monkeypatch):
    """Above max_index_rows the auto method must take the distributed LSH
    path and never collect the corpus to the driver — the seam raises if
    the brute-force index path is touched."""
    emb = bq.load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))

    def _no_collect(raw):
        raise AssertionError("driver collect on the auto-LSH path")

    monkeypatch.setattr(similarity, "_collect_corpus", _no_collect)
    pairs = similarity.embedding_dup_pairs(
        emb, 0.45, method="auto", max_index_rows=10).collect()
    # LSH verifies candidates with true cosine: precision 1 vs brute force
    brute = {(r["id_a"], r["id_b"]) for r in similarity.embedding_dup_pairs(
        emb, 0.45, method="expr").collect()}
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got <= brute and len(got) > 0


def test_embedding_dup_auto_small_uses_index(spark):
    """Below the bound, auto == the exact numpy index path."""
    emb = bq.load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    auto = {(r["id_a"], r["id_b"]) for r in similarity.embedding_dup_pairs(
        emb, 0.45, method="auto").collect()}
    exact = {(r["id_a"], r["id_b"]) for r in similarity.embedding_dup_pairs(
        emb, 0.45, method="numpy").collect()}
    assert auto == exact and len(auto) > 0


def test_lsh_hot_bucket_chunk_split_lossless(spark):
    """Splitting oversized buckets into chunk-pair tasks must be
    recall-LOSSLESS: forcing tiny max_bucket on the same corpus yields the
    exact same verified pair set (every doc pair still meets in exactly
    one chunk-pair group — unlike salting, which drops cross-salt pairs)."""
    emb = bq.load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    base = {(r["id_a"], r["id_b"]): r["cosine_sim"]
            for r in similarity.lsh_bucketed_pairs(emb, 0.45).collect()}
    split = {(r["id_a"], r["id_b"]): r["cosine_sim"]
             for r in similarity.lsh_bucketed_pairs(
                 emb, 0.45, max_bucket=4).collect()}
    assert base == split and len(base) > 0


def test_null_and_zero_vectors_are_safe(spark):
    """Degenerate corpora must not fail the job: NULL embeddings are
    dropped at every entry point; zero vectors get cosine 0 (ANSI divide
    would otherwise hard-fail on one bad row)."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [1.0, 0.01]), (4, [0.0, 0.0])],
        "vec_id long, embedding array<double>")

    pairs = {(r["id_a"], r["id_b"])
             for r in similarity.embedding_dup_pairs(
                 df, 0.9, method="numpy").collect()}
    assert pairs == {(1, 3)}
    pairs_expr = {(r["id_a"], r["id_b"])
                  for r in similarity.embedding_dup_pairs(
                      df, 0.9, method="expr").collect()}
    assert pairs_expr == {(1, 3)}
    lsh = {(r["id_a"], r["id_b"])
           for r in similarity.embedding_dup_pairs(
               df, 0.9, method="lsh").collect()}
    assert lsh <= {(1, 3)}  # recall may miss; must not crash or add junk

    top = similarity.cosine_topk(df, df.filter("vec_id = 1"), k=3).collect()
    got = {r["vec_id"]: r["cosine_sim"] for r in top}
    assert got[3] > 0.99 and got[4] == 0.0 and 2 not in got

    rows = similarity.ivf_topk(df, df.filter("vec_id = 1"), k=2,
                               n_clusters=2, n_probe=2).collect()
    assert all(r["vec_id"] != 2 for r in rows)


def test_label_centroids_hand_computed(spark):
    from funnel_rocket_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [1.0, 2.0], 0), (2, [3.0, 4.0], 0), (3, [10.0, 20.0], 1)],
        "vec_id INT, embedding ARRAY<FLOAT>, label INT",
    )
    rows = {r["label"]: r for r in similarity.label_centroids(df).collect()}
    assert rows[0]["n_vectors"] == 2
    assert rows[0]["centroid"] == [2.0, 3.0]
    assert rows[1]["n_vectors"] == 1
    assert rows[1]["centroid"] == [10.0, 20.0]


def test_np_round6_matches_sql_round_semantics():
    """gemm paths round with numpy; expr twins and the DuckDB oracles use
    SQL round (half away from zero). np.round is banker's rounding — a
    cosine exactly on a half in the 6th decimal must not flip a >=
    threshold verdict between strategies."""
    import numpy as np

    from funnel_rocket_spark.operators.similarity import (_np_round6,
                                                          _round6)

    vals = [0.1234565, -0.1234565, 0.1234575, -0.1234575, 0.9999995,
            -0.9999995, 0.5e-6, -0.5e-6, 0.0, 1.0, -1.0, 0.123456789]
    got = _np_round6(np.array(vals))
    want = [_round6(v) for v in vals]
    assert got.tolist() == want


def test_embedding_dup_auto_sizes_without_probe_job(spark, monkeypatch):
    """For locally-readable parquet scans under the bound, auto sizes the
    corpus from parquet footers — no probe job. limit() is the probe's
    first call; poisoning it proves the lazy path."""
    from pyspark.sql import DataFrame

    emb = bq.load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    assert similarity._scan_rowcount_upper_bound(emb) == 500

    def _boom(self, n):
        raise AssertionError("probe job ran despite a usable footer bound")

    monkeypatch.setattr(DataFrame, "limit", _boom)
    pairs = similarity.embedding_dup_pairs(emb, 0.45, method="auto").collect()
    assert len(pairs) > 0


def test_embedding_dup_row_hint_overrides_sizing(spark, monkeypatch):
    """A caller row_hint wins over both the footer bound and the probe —
    and a large hint routes to LSH without touching the driver index."""
    emb = bq.load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))

    def _no_collect(raw):
        raise AssertionError("driver collect despite a large row_hint")

    monkeypatch.setattr(similarity, "_collect_corpus", _no_collect)
    pairs = similarity.embedding_dup_pairs(
        emb, 0.45, method="auto", row_hint=10_000_000).collect()
    brute = {(r["id_a"], r["id_b"]) for r in similarity.embedding_dup_pairs(
        emb, 0.45, method="expr").collect()}
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got <= brute and len(got) > 0


def test_ivf_pq_codes_shape_and_determinism(spark):
    emb = bq.load_table(spark, "/root/testdata/sf0.001", "embeddings")
    codes, centers, cb = similarity.ivf_pq_index(
        emb, n_clusters=8, m=8, n_bits=4, rounds=2)
    rows = codes.collect()
    assert len(rows) == emb.where(F.col("embedding").isNotNull()).count()
    for r in rows[:50]:
        assert len(r["__codes"]) == 8
        assert all(0 <= c < 16 for c in r["__codes"])
    assert cb.shape == (8, 16, 8)
    codes2, _, cb2 = similarity.ivf_pq_index(
        emb, n_clusters=8, m=8, n_bits=4, rounds=2)
    import numpy as np

    assert np.array_equal(cb, cb2)
    assert sorted(map(tuple, ((r["vec_id"], tuple(r["__codes"]))
                              for r in rows))) == \
        sorted(map(tuple, ((r["vec_id"], tuple(r["__codes"]))
                           for r in codes2.collect())))


def test_ivf_pq_exact_when_codebook_covers_corpus(spark):
    """With m=1 and K >= corpus size, every residual is its own codebook
    entry (seeds ARE the residuals), so ADC distance is exact and
    full-probe IVF-PQ must equal brute force identically."""
    emb = bq.load_table(spark, "/root/testdata/sf0.001", "embeddings") \
        .filter(F.col("vec_id") < 60)
    queries = emb.filter(F.col("vec_id") < 3)
    exact = _result_sets(similarity.cosine_topk(emb, queries, k=5))
    pq = _result_sets(similarity.ivf_pq_topk(
        emb, queries, k=5, n_clusters=2, m=1, n_bits=6, n_probe=2,
        rounds=1))
    assert pq == exact


def test_ivf_pq_finds_planted_near_dup(spark):
    """Clustered corpus with a planted cosine≈0.999 twin per query: the
    PQ path must put the twin in top-1 — the realistic (non-uniform)
    workload PQ exists for."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(4, 64)
    rows = []
    for i in range(200):
        v = centers[i % 4] + 0.05 * rng.randn(64)
        rows.append((i, [float(x) for x in v]))
    # plant twins: vec 1000+j = vec j + tiny noise, j in 0..2
    for j in range(3):
        twin = np.array(rows[j][1]) + 1e-3 * rng.randn(64)
        rows.append((1000 + j, [float(x) for x in twin]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 3)
    out = similarity.ivf_pq_topk(emb, queries, k=3, n_clusters=4, m=8,
                                 n_bits=6, n_probe=2, rounds=3)
    best = {}
    for r in out.collect():
        cur = best.get(r["query_id"])
        if cur is None or r["approx_cosine"] > cur[1]:
            best[r["query_id"]] = (r["vec_id"], r["approx_cosine"])
    for j in range(3):
        assert best[j][0] == 1000 + j, best


def test_ivf_pq_rerank_recovers_exact_ranking(spark):
    """The Refine stage: ADC keeps true neighbors inside its top-R, exact
    re-ranking then reproduces brute-force top-k — full-probe + covering
    rerank depth must equal cosine_topk exactly, scores included."""
    emb = bq.load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    exact = {(r["query_id"], r["vec_id"]): r["cosine_sim"]
             for r in similarity.cosine_topk(emb, queries, k=5).collect()}
    codes, centers, cb = similarity.ivf_pq_index(
        emb, n_clusters=4, m=8, n_bits=6, rounds=2)
    got = {(r["query_id"], r["vec_id"]): r["cosine_sim"]
           for r in similarity.ivf_pq_search(
               codes, centers, cb, queries, k=5, n_probe=4,
               rerank_with=emb, rerank_depth=600).collect()}
    assert got == exact


def test_footer_bound_refused_for_row_multiplying_plans(spark):
    """ADVICE r4 (medium): inputFiles() lists the base files even when the
    plan joins/explodes, so the footer sum would UNDER-count and auto
    could route an oversized corpus onto the driver-collect index path.
    The bound must refuse non-scan-shaped plans and keep working for
    scan/filter/project/union shapes."""
    emb = bq.load_table(spark, "/root/testdata/sf0.001", "embeddings")
    # scan-shaped: project / filter / limit all keep the bound usable
    assert similarity._scan_rowcount_upper_bound(emb) == 500
    assert similarity._scan_rowcount_upper_bound(
        emb.select("vec_id").filter(F.col("vec_id") % 2 == 0)) == 500
    assert similarity._scan_rowcount_upper_bound(emb.limit(5)) == 500
    # union: inputFiles() DEDUPLICATES paths, so a self-union's footer sum
    # under-counts 2x -> must refuse
    assert similarity._scan_rowcount_upper_bound(
        emb.select("vec_id").unionByName(emb.select("vec_id"))) is None
    # row-multiplying plans: refuse (return None -> caller probes)
    self_join = emb.select("vec_id").join(
        emb.select(F.col("vec_id").alias("v2")),
        F.lit(True), "cross")
    assert similarity._scan_rowcount_upper_bound(self_join) is None
    exploded = emb.select("vec_id", F.explode("embedding").alias("x"))
    assert similarity._scan_rowcount_upper_bound(exploded) is None
    # aggregate/shuffled plans: not scan-shaped, refuse conservatively
    assert similarity._scan_rowcount_upper_bound(
        emb.groupBy("vec_id").count()) is None
