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

    With ``sort_col`` the data is first repartitioned to exactly one
    writer task per bucket (both sides hash with Murmur3 on
    ``group_col``, so partition *i* holds exactly bucket *i*'s rows):
    Spark trusts a bucket's ``sortBy`` order at SCAN time only when the
    bucket is a single file, and that declared (group, ts) order is what
    lets the engine's window-anchor pass run exchange-free AND sort-free
    (``QueryEngine._sorted_layout``). Write parallelism = num_buckets;
    size the bucket count for the table, not the writing cluster.
    """
    if mode == "overwrite" and not df.sparkSession.catalog.tableExists(
            table_name):
        # a crashed/killed earlier writer can leave the managed-table
        # LOCATION on disk with no catalog entry — saveAsTable then
        # fails LOCATION_ALREADY_EXISTS even in overwrite mode (the
        # overwrite only drops tables the catalog knows about). Clear
        # the debris; never touches a live table's location.
        import shutil
        from urllib.parse import urlparse

        loc = urlparse(df.sparkSession.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse")).path
        stale = os.path.join(loc, table_name.lower())
        if os.path.isdir(stale):
            shutil.rmtree(stale)
    if sort_col is not None:
        df = df.repartition(num_buckets, F.col(group_col))
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

    Exactly-N guarantee, entirely JVM-side (no Python-serializer round
    trip of row data — rounds ≤4 routed every row through an RDD identity
    partitioner): the shard id is an md5-derived column, the frame is
    ``repartition(shards, __shard)``-ed (collisions of two shard ids into
    one partition are fine — ``partitionBy`` still splits them into
    separate directories, one file each, since all rows of a shard land
    in one task), written as a ``__shard=i/`` Hive layout, and the driver
    FLATTENS the directories into ``part-{i:05}`` files with Hadoop-FS
    renames (scheme-agnostic; on object stores the "rename" is the usual
    copy-commit, still metadata-cheap next to the write). A shard left
    genuinely empty by a tiny/skewed keyspace is padded with an empty
    part file (uncompressed only — an empty .gz would not be a valid
    stream) so loaders addressing file i of N always find N files.
    """
    spark = df.sparkSession
    if shard_col is None:
        writer = df.repartition(shards).write.mode(mode)
        if compression:
            writer = writer.option("compression", compression)
        writer.json(path)
        return

    # md5-derived shard id: deterministic, engine-portable, and stable
    # across runs/layouts (same contract the sampling operators use).
    key = F.coalesce(F.col(shard_col).cast("string"), F.lit("__null__"))
    shard = F.pmod(
        F.conv(F.substring(F.md5(key.cast("binary")), 1, 8), 16, 10)
        .cast("long"), F.lit(shards)).cast("int")
    out = df.withColumn("__shard", shard).repartition(shards, "__shard")
    writer = out.write.mode(mode).partitionBy("__shard")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
    _flatten_shard_dirs(spark, path, shards, pad=not compression)


def _flatten_shard_dirs(spark, path: str, shards: int, pad: bool) -> None:
    """Flatten a ``__shard=i/`` Hive layout into flat ``part-{i:05}-*``
    files via Hadoop-FS renames (works on any scheme), optionally padding
    empty shards with empty part files so exactly ``shards`` files exist.

    Append-safe: ``mode="append"`` leaves flat ``part-{i:05d}*`` files
    from prior writes in place; new files continue the ``-{j}`` suffix
    AFTER the existing count (Hadoop ``rename`` returns false onto an
    existing destination, so reusing a name would raise). A stale
    ``-empty`` pad for a shard that just received data is deleted, so a
    shard never holds both a pad and data."""
    jvm = spark.sparkContext._jvm
    HPath = jvm.org.apache.hadoop.fs.Path
    root = HPath(path)
    fs = root.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    statuses = list(fs.listStatus(root))
    # Prior flat files per shard id (append mode): data files bump the
    # suffix base; pad files are remembered for deletion-on-new-data.
    prior: dict = {}
    pads: dict = {}
    for st in statuses:
        name = st.getPath().getName()
        if st.isFile() and name.startswith("part-"):
            # parse the full digit run, not a fixed 5-char slice — shard
            # ids >= 100000 would otherwise mis-parse, collide with the
            # prior files' names, and fail the flatten mid-way
            digits = name[5:].split("-", 1)[0]
            if not digits.isdigit():
                continue
            i = int(digits)
            if name.endswith("-empty.json"):
                pads[i] = st.getPath()
            else:
                prior[i] = prior.get(i, 0) + 1
    seen = set(prior)
    for st in statuses:
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("__shard=")):
            continue
        try:
            i = int(name.split("=", 1)[1])
        except ValueError:
            continue
        files = [s.getPath() for s in fs.listStatus(st.getPath())
                 if s.isFile() and not s.getPath().getName().startswith(("_", "."))]
        if files:
            seen.add(i)
            if i in pads:  # shard has data now: drop the stale pad
                fs.delete(pads.pop(i), False)
        base = prior.get(i, 0)
        for j, p in enumerate(sorted(files, key=lambda p: p.getName()),
                              start=base):
            ext = p.getName().split("part-")[-1]
            ext = ext[ext.index("."):] if "." in ext else ".json"
            suffix = f"-{j}" if j else ""
            dest = HPath(path + f"/part-{i:05d}{suffix}-shard{ext}")
            if not fs.rename(p, dest):
                raise IOError(f"shard flatten rename failed: {p} -> {dest}")
        fs.delete(st.getPath(), True)
    if pad:
        for i in range(shards):
            if i not in seen and i not in pads:
                fs.create(
                    HPath(path + f"/part-{i:05d}-empty.json"), True).close()


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

    if bits * len(cols) > 63:
        # bit j*len(cols)+i must fit a signed long: at the default bits=8
        # that's 7 columns max; position 63 would overflow the literal
        # (or flip the key's sign and corrupt the clustering sort)
        raise ValueError(
            f"zorder_key: bits*len(cols) = {bits * len(cols)} exceeds 63 "
            f"(signed-long interleave); lower bits (e.g. "
            f"{63 // len(cols)} for {len(cols)} columns)")
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
