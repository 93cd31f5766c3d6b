"""Data-prep sources/sinks: CSV ingest with denormalizing join (reference S5)
and group-partitioned Parquet writing (reference S6).

The reference ships these as standalone Pandas map/reduce tools
(``/root/reference/dataprep_example/ingest_retailrocket_dataset.py`` and
``repartition.py`` — hash = ``id % num_parts``, per-part files, optional
sort). On Spark both are one-liners around the DataFrame writer; the value
added here is the *layout contract*: bucketed-by-group output lets every
subsequent funnel query run shuffle-free, which is the Spark equivalent of
the reference's every-group-in-one-file invariant (``README.md:123-124``).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ingest_csv_denormalized(
    spark: SparkSession,
    events_csv: str,
    properties_csv: Optional[str] = None,
    join_key: str = "itemid",
    header: bool = True,
) -> DataFrame:
    """CSV events (+ optional item-properties CSV) → denormalized DataFrame.

    Mirrors the reference's RetailRocket prep (inner equi-join on the item
    key, ``ingest_retailrocket_dataset.py:58``). The properties side is
    explicitly broadcast — the dimension table is small by construction.
    """
    events = spark.read.csv(events_csv, header=header, inferSchema=True)
    if properties_csv is None:
        return events
    props = spark.read.csv(properties_csv, header=header, inferSchema=True)
    return events.join(F.broadcast(props), on=join_key, how="inner")


def repartition_by_group(
    df: DataFrame,
    path: str,
    group_col: str,
    num_parts: int,
    sort_col: Optional[str] = None,
    mode: str = "overwrite",
) -> None:
    """Write Parquet repartitioned so each group's rows share one file part
    (reference S6, ``repartition.py:47-64,123-154``).

    ``repartition(num_parts, group)`` hash-distributes whole groups;
    ``sortWithinPartitions`` optionally orders rows (the reference offers
    sort-by-group+ts for locality). For query-time shuffle elimination prefer
    :func:`write_bucketed` — file-level partitioning alone is opaque to
    Catalyst.
    """
    out = df.repartition(num_parts, F.col(group_col))
    if sort_col is not None:
        out = out.sortWithinPartitions(group_col, sort_col)
    out.write.mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    group_col: str,
    num_buckets: int,
    sort_col: Optional[str] = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed table: ``bucketBy(group)`` makes the layout visible
    to Catalyst, so ``groupBy(group)`` / group-keyed joins skip their
    exchange entirely — the 100 TB-scale parity with the reference's
    partitioning invariant, but declared instead of hand-maintained.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, group_col)
    if sort_col is not None:
        writer = writer.sortBy(group_col, sort_col)
    writer.format("parquet").saveAsTable(table_name)


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    granularity: str = "day",
    extra_partition_cols: Optional[list[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Write Parquet hive-partitioned by a date derived from ``ts_col``
    (``.../__pdate=2024-01-05/part-*.parquet``).

    The reference scans every part on every query (SURVEY §4: no partition
    pruning). Date-partitioned layout makes a query `timeframe` prune whole
    directories at planning time — at 100 TB the difference between reading
    a day and reading a year. ``granularity`` is any `date_trunc` unit
    ("day", "month", "hour"); combine with low-cardinality dims via
    ``extra_partition_cols``. Partition count = days × dims — keep it in the
    thousands, not millions, or listing dominates.
    """
    pdate = F.date_trunc(granularity, F.col(ts_col)).cast("date")
    out = df.withColumn("__pdate", pdate)
    cols = ["__pdate"] + list(extra_partition_cols or [])
    out.write.mode(mode).partitionBy(*cols).parquet(path)


def ingest_jsonl(
    spark: SparkSession,
    path: str,
    schema=None,
    columns: Optional[list[str]] = None,
    corrupt_col: Optional[str] = None,
) -> DataFrame:
    """JSONL corpus ingest — the lingua franca of training-data pipelines
    (one JSON object per line, newline-delimited, splittable).

    ALWAYS pass ``schema`` at scale: without it Spark runs a full
    inference pre-pass over every byte before the real read — a 2× scan
    of a 100 TB corpus. With an explicit schema the reader is single-pass
    and projects only the fields the schema names (JSON pushdown prunes
    unparsed fields). ``corrupt_col`` keeps malformed lines in a side
    column (PERMISSIVE mode) instead of dropping them silently — count
    them, don't lose them.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if corrupt_col is not None:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col)
    df = reader.json(path)
    return df.select(*columns) if columns else df


def write_sharded_jsonl(
    df: DataFrame,
    path: str,
    shards: int,
    shard_col: Optional[str] = None,
    mode: str = "overwrite",
    compression: Optional[str] = None,
) -> None:
    """Export as exactly ``shards`` JSONL files — training loaders
    address fixed shard counts (file i of N per data-parallel rank).

    With ``shard_col`` the routing is a DETERMINISTIC hash of that column
    (same row → same shard on every run, so shard contents are
    reproducible and co-sharded with any other export keyed the same
    way); without it, round-robin gives the evenest sizes. Gzip/zstd
    compression keeps lines splittable at the file level (one shard =
    one stream), which is how loaders consume them anyway.

    Exactly-N guarantee: hash routing uses an IDENTITY partitioner (shard
    id == partition id), not ``repartition(shards, col)`` — that re-hashes
    the hash, so two shard ids can collide into one partition and leave
    another empty, and Spark writes no file for an empty task. A shard
    left genuinely empty by a tiny/skewed keyspace is padded with an empty
    part file (local paths, uncompressed) so loaders addressing file i of
    N always find N files; for remote/compressed outputs the pad is
    skipped — address shards positionally only when the keyspace covers
    them. The identity partitioner routes rows through the Python
    serializer; export jobs are write-I/O-bound, so this is not the
    bottleneck, but at very large scale prefer ``partitionBy`` directory
    layouts over fixed file counts.
    """
    if shard_col is None:
        out = df.repartition(shards)
    else:
        import hashlib

        schema = df.schema
        idx = schema.fieldNames().index(shard_col)

        def _shard(value, _n=shards) -> int:
            digest = hashlib.md5(repr(value).encode("utf-8")).digest()
            return int.from_bytes(digest[:4], "big") % _n

        rdd = (
            df.rdd.map(lambda r, _i=idx: (_shard(r[_i]), r))
            .partitionBy(shards, lambda k: k)
            .values()
        )
        out = df.sparkSession.createDataFrame(rdd, schema)
    writer = out.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)

    if shard_col is not None and not compression:
        _pad_missing_shards(path, shards)


def _pad_missing_shards(path: str, shards: int) -> None:
    """Create empty part files for shards that got no rows (local paths
    only) so the produced file count equals ``shards``."""
    local = path[len("file://"):] if path.startswith("file://") else path
    if "://" in local or not os.path.isdir(local):
        return
    parts = sorted(f for f in os.listdir(local) if f.startswith("part-"))
    have = {int(f.split("-")[1]) for f in parts}
    for i in range(shards):
        if i not in have:
            open(os.path.join(local, f"part-{i:05d}-empty.json"), "w").close()


def zorder_key(df, cols: list[str], bits: int = 8,
               out_col: str = "__zkey"):
    """Add a Z-order (Morton) interleave key over ``cols`` → (df + key).

    Each column is first bucketed into ``2^bits`` EXACT global quantile
    buckets (``olap.exact_ntile`` — distributed, no single-partition
    window), so the interleave is rank-based and immune to value skew and
    arbitrary types, exactly like Delta Lake's OPTIMIZE ZORDER. The bucket
    indexes are then bit-interleaved into one integer key: sorting by it
    places rows so that ANY prefix of the key fixes a hypercube of the
    bucket grid — parquet min/max stats of files sorted this way prune on
    EVERY participating column, not just the leading one of a
    lexicographic sort.

    Cost: one range exchange + per-partition window per column (the
    exact_ntile machinery), then the caller's range sort on the key.
    """
    from funnel_rocket_spark.operators.olap import exact_ntile

    n = 1 << bits
    out = df
    bucket_cols = []
    for c in cols:
        bc = f"__zb_{c}"
        out = exact_ntile(out, n, [F.col(c)], out_col=bc)
        bucket_cols.append(bc)
    # interleave: bit j of column i lands at position j*len(cols)+i
    key = F.lit(0).cast("long")
    for j in range(bits):
        for i, bc in enumerate(bucket_cols):
            # ntile buckets are 1-based; shift to 0-based before slicing bits
            bit = F.shiftright(F.col(bc) - F.lit(1), j).bitwiseAND(F.lit(1))
            key = key + (bit.cast("long")
                         * F.lit(1 << (j * len(cols) + i)).cast("long"))
    return out.withColumn(out_col, key).drop(*bucket_cols)


def write_zordered(df, path: str, cols: list[str], bits: int = 8,
                   partitions: int | None = None) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``.

    ``repartitionByRange`` on the interleave key (files = key ranges =
    grid hypercubes) + ``sortWithinPartitions`` (row groups within a file
    cluster too). The payoff is at scan time, with zero reader changes:
    a filter on ANY of ``cols`` prunes most files/row-groups via plain
    parquet min/max stats — where a lexicographic sort only prunes on its
    leading column. See ``tests/test_round3_ops.py`` for the measured
    per-file range-width contrast.
    """
    keyed = zorder_key(df, cols, bits)
    out = (keyed.repartitionByRange(partitions, F.col("__zkey"))
           if partitions else keyed.repartitionByRange(F.col("__zkey")))
    (out.sortWithinPartitions("__zkey").drop("__zkey")
     .write.mode("overwrite").parquet(path))


def write_time_zordered(df: DataFrame, path: str, ts_col: str,
                        cols: list[str], granularity: str = "day",
                        bits: int = 8, mode: str = "overwrite") -> None:
    """Multi-level layout: hive date partitions from ``ts_col`` with
    Z-order clustering of ``cols`` INSIDE each partition — Delta's
    ``PARTITIONED BY (date) ... OPTIMIZE ZORDER BY (a, b)`` composed from
    :func:`write_time_partitioned` and :func:`zorder_key`.

    Pruning then works at two levels with zero reader changes: a query
    ``timeframe`` drops whole date DIRECTORIES at planning time, and a
    filter on any of ``cols`` drops most FILES/row-groups inside the
    surviving dates via parquet min/max stats.

    Bucket boundaries come from ONE global exact-quantile pass (the
    ``zorder_key`` machinery) rather than per-date passes: global ranks
    still cluster within every date, per-date re-ranking would add a
    range exchange per partition value, and the boundary drift only
    matters if the value distribution shifts radically between dates —
    re-layout with a narrower input window if it does. The range
    repartition keys on (date, zkey), so output tasks write contiguous
    zkey runs into their date directory instead of appending to every
    one of them.
    """
    pdate = F.date_trunc(granularity, F.col(ts_col)).cast("date")
    keyed = zorder_key(df.withColumn("__pdate", pdate), cols, bits)
    (keyed.repartitionByRange(F.col("__pdate"), F.col("__zkey"))
     .sortWithinPartitions("__pdate", "__zkey")
     .drop("__zkey")
     .write.mode(mode).partitionBy("__pdate").parquet(path))
