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
        def read_or_none(path: str):
            # ONLY path-not-found means "first batch, nothing indexed
            # yet" — a transient storage error (throttle, datanode flap,
            # corrupt footer) swallowed here would silently replace the
            # entire dedup history with an empty index and leave an
            # unrecoverable recall hole; those must fail the batch so
            # the stream retries
            from pyspark.errors import AnalysisException
            try:
                return spark.read.parquet(path)
            except AnalysisException as e:
                if ("PATH_NOT_FOUND" in str(e)
                        or "Path does not exist" in str(e)):
                    return None
                raise

        idx_read = read_or_none(index_path)
        index = (idx_read.where(F.col("batch") != F.lit(batch_id))
                 if idx_read is not None else
                 dedup.minhash_band_table(
                     batch.limit(0), text_col, id_col, num_hashes,
                     bands, n))
        corpus_read = read_or_none(corpus_path)
        corpus = (corpus_read.where(F.col("batch") != F.lit(batch_id))
                  .drop("batch")
                  if corpus_read is not None else batch.limit(0))
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

    1. recover: if a prior attempt's temp dir exists AND carries the
       completion marker AND ``batch=-1`` is absent, the temp dir is the
       ONLY complete copy of the previously-compacted rows — promote it
       to ``batch=-1`` (a crash landed between steps 5 and 6 below);
       otherwise delete any leftover temp/aside dirs (their rows are
       still readable elsewhere);
    2. read EVERYTHING (live batches + any prior ``batch=-1``), distinct;
    3. write to a dot-prefixed temp dir (hidden from partition discovery);
    4. stamp a completion marker file inside it (committer-config
       independent — ``_SUCCESS`` can be disabled);
    5. rename the old ``batch=-1`` aside to a dot-prefixed dir (its rows
       are in the temp output);
    6. rename temp → ``batch=-1`` (atomic on HDFS/local);
    7. delete the aside dir and the ``batch=N`` dirs (their rows are in
       ``batch=-1``).

    A crash at any point leaves a complete, recoverable index: before
    step 5 the old ``batch=-1`` is untouched; between 5 and 6 step 1's
    promotion restores the temp output (which supersets the aside rows);
    after 6 the new ``batch=-1`` is live and the leftovers are
    duplicates that step 1 deletes and whose rows the next compaction's
    distinct (and ``incremental_lsh_pairs``'s candidate ``distinct``)
    collapse. ``-1`` sits outside foreachBatch's id space, so the
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
    tmp = HPath(index_path + "/.compact_tmp")
    aside = HPath(index_path + "/.compact_old")
    compacted = HPath(index_path + "/batch=-1")
    marker = HPath(index_path + "/.compact_tmp/_FRS_COMPLETE")
    # -- step 1: recovery from a crashed prior attempt ------------------
    if fs.exists(tmp) and fs.exists(marker) and not fs.exists(compacted):
        # The temp dir is a COMPLETE index (marker proves the write
        # finished) and batch=-1 is gone (the crash hit after the
        # rename-aside): promote it — deleting it here would permanently
        # lose the previously-compacted band rows.
        if not fs.rename(tmp, compacted):
            raise IOError(
                f"compact_band_index: recovery rename failed under {index_path}")
    fs.delete(tmp, True)    # partial write from a crashed attempt
    fs.delete(aside, True)  # rows live on in batch=-1 (or the promoted tmp)
    batch_dirs = [st.getPath() for st in fs.listStatus(root)
                  if st.isDirectory()
                  and st.getPath().getName().startswith("batch=")]
    live = [p for p in batch_dirs if p.getName() != "batch=-1"]
    if not live:
        return 0
    n_files = files_per_compaction or spark.sparkContext.defaultParallelism
    # -- steps 2-4: write the merged index to tmp, stamp it complete ----
    (spark.read.parquet(index_path).drop("batch").distinct()
     .repartition(n_files, "band", "bucket")
     .sortWithinPartitions("band", "bucket")
     .write.mode("overwrite").parquet(str(tmp)))
    fs.create(marker, True).close()
    # -- steps 5-7: swap into place, then clean up ----------------------
    if fs.exists(compacted) and not fs.rename(compacted, aside):
        raise IOError(f"compact_band_index: aside rename failed under {index_path}")
    if not fs.rename(tmp, compacted):
        raise IOError(f"compact_band_index: rename failed under {index_path}")
    fs.delete(aside, True)
    removed = 0
    for p in live:
        fs.delete(p, True)
        removed += 1
    return removed
