"""Streaming near-duplicate detection against a rolling LSH index.

EXTENSION beyond the reference (funnel-rocket is strictly batch). The
continuous twin of ``operators.dedup.incremental_lsh_pairs``: each
micro-batch of documents is deduplicated against (a) everything that
arrived before it — represented by the persisted band-table index, never
re-hashed — and (b) itself; then the batch's own band rows and text roll
the index forward for the batches after it.

Contrast with ``streaming_exact_dedup``: that one holds digest state in
the streaming state store and is bounded by a watermark window. This one
keeps NO streaming state at all — the "state" is the parquet index, which
is unbounded, exact over the whole stream history, and shared with the
batch pipeline (a nightly batch job and this stream can roll the SAME
index forward).

Write layout: every sink is written as a ``batch=N`` subdirectory with
overwrite semantics, so a foreachBatch retry after a crash rewrites the
same directory instead of double-appending — the standard idempotence
recipe for non-transactional parquet sinks. (Spark's partition discovery
surfaces the ``batch`` directory as an extra column on read; the join
logic keys only on (band, bucket) and ids, so it rides along harmlessly
and doubles as lineage.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from funnel_rocket_spark.operators import dedup


def streaming_incremental_dedup(docs: DataFrame, corpus_path: str,
                                index_path: str, pairs_path: str,
                                text_col: str = "text",
                                id_col: str = "doc_id",
                                num_hashes: int = 32, bands: int = 8,
                                n: int = 3, threshold: float = 0.5):
    """Wire a streaming docs frame into the rolling-index dedup.

    Returns a ``DataStreamWriter`` (caller adds checkpoint/trigger and
    ``.start()``). Per micro-batch: near-dup pairs touching the batch are
    written to ``pairs_path/batch=N``; the batch's band rows and raw docs
    are written to ``index_path/batch=N`` / ``corpus_path/batch=N``.
    Document ids must be globally unique across the stream (same contract
    as the batch operator).
    """

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # On a foreachBatch RETRY after this batch's index/corpus writes
        # already succeeded, the parent-dir read would include batch N's own
        # rows — violating incremental_lsh_pairs' disjoint-id contract and
        # emitting every verified pair twice. The partition column the
        # overwrite layout exists for (see module docstring) is also the
        # retry filter: exclude batch == batch_id on read.
        try:
            index = (spark.read.parquet(index_path)
                     .where(F.col("batch") != F.lit(batch_id)))
        except Exception:  # first batch: nothing indexed yet
            index = dedup.minhash_band_table(
                batch.limit(0), text_col, id_col, num_hashes, bands, n)
        try:
            corpus = (spark.read.parquet(corpus_path)
                      .where(F.col("batch") != F.lit(batch_id))
                      .drop("batch"))
        except Exception:
            corpus = batch.limit(0)
        batch = batch.persist()
        pairs = dedup.incremental_lsh_pairs(
            batch, corpus, index=index, text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, bands=bands, n=n, threshold=threshold)
        pairs.write.mode("overwrite").parquet(
            f"{pairs_path}/batch={batch_id}")
        dedup.minhash_band_table(
            batch, text_col, id_col, num_hashes, bands, n
        ).write.mode("overwrite").parquet(f"{index_path}/batch={batch_id}")
        (batch.write.mode("overwrite")
         .parquet(f"{corpus_path}/batch={batch_id}"))
        batch.unpersist()

    return docs.writeStream.foreachBatch(process)


def compact_band_index(spark, index_path: str,
                       files_per_compaction: int | None = None) -> int:
    """Compact the rolling ``batch=N`` band-table index into a single
    ``batch=-1`` partition, bounding read amplification on long streams
    (every micro-batch adds a directory; a year of 5-minute batches is
    ~100k dirs of tiny files). Returns the number of per-batch
    directories folded in.

    Layout of the compacted partition: hash-repartitioned AND sorted by
    (band, bucket) within files, so the probe join's bucket lookups read
    contiguous, min/max-prunable ranges.

    Crash-safe against the stream's retry semantics, in this order:

    1. read EVERYTHING (live batches + any prior ``batch=-1``), distinct;
    2. write to a dot-prefixed temp dir (hidden from partition discovery);
    3. delete the old ``batch=-1`` (its rows are in the temp output);
    4. rename temp → ``batch=-1`` (atomic on HDFS/local);
    5. delete the ``batch=N`` dirs (their rows are in ``batch=-1``).

    A crash at any point leaves a complete, readable index — at worst with
    duplicate rows, which the next compaction's distinct removes and which
    ``incremental_lsh_pairs`` already collapses at its candidate
    ``distinct``. ``-1`` sits outside foreachBatch's id space, so the
    ``batch != batch_id`` retry exclusion in ``process()`` keeps working.
    Single-writer rule: do not run concurrently with the stream's
    ``process()`` (same contract as any non-transactional parquet sink).
    """
    jvm = spark.sparkContext._jvm
    HPath = jvm.org.apache.hadoop.fs.Path
    root = HPath(index_path)
    fs = root.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return 0
    batch_dirs = [st.getPath() for st in fs.listStatus(root)
                  if st.isDirectory()
                  and st.getPath().getName().startswith("batch=")]
    live = [p for p in batch_dirs if p.getName() != "batch=-1"]
    if not live:
        return 0
    n_files = files_per_compaction or spark.sparkContext.defaultParallelism
    tmp = HPath(index_path + "/.compact_tmp")
    fs.delete(tmp, True)  # leftover from a crashed prior attempt
    (spark.read.parquet(index_path).drop("batch").distinct()
     .repartition(n_files, "band", "bucket")
     .sortWithinPartitions("band", "bucket")
     .write.mode("overwrite").parquet(str(tmp)))
    fs.delete(HPath(index_path + "/batch=-1"), True)
    if not fs.rename(tmp, HPath(index_path + "/batch=-1")):
        raise IOError(f"compact_band_index: rename failed under {index_path}")
    removed = 0
    for p in live:
        fs.delete(p, True)
        removed += 1
    return removed
