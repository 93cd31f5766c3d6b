"""General-OLAP operators beyond the reference's aggregation set.

Currently: exact grouped percentiles in histogram form. Spark's native
``percentile`` is a holistic TypedImperativeAggregate — every partial buffer
carries ALL raw values to as many reduce tasks as there are groups, so a
3-group percentile over 100 TB funnels the whole column through 3 tasks.
The histogram formulation keeps everything in whole-stage codegen:

1. ``groupBy(keys, value).count()`` — map-side partial aggregation compresses
   repeated values BEFORE the shuffle; shuffle keys are (key, value), spread
   across all partitions.
2. One window pass per key over the (much smaller) distinct-value histogram
   computes cumulative and total counts (an opt-in distributed form exists
   for whale-sized per-group histograms — see
   :func:`percentiles_from_histogram`).
3. Each requested quantile becomes two conditional ``min()`` aggregates
   (the floor/ceil neighbors of the target rank) + linear interpolation —
   bit-identical to ``percentile`` / DuckDB ``quantile_cont`` semantics
   (rank ``q*(n-1)``, nulls ignored).

The reference has no percentile aggregations at all (SURVEY §2.4 "absent").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_value_histogram(
    df: DataFrame, group_cols: list[str], value
) -> DataFrame:
    """(groups..., __v, __c): distinct-value histogram of ``value`` per
    group — the lightweight proxy every percentile/winsorize decision can
    be made on without touching the raw rows again. Map-side partial
    aggregation compresses repeated values before the one exchange.

    NO null pre-filter: null values ride the histogram as ZERO-WEIGHT rows
    downstream (never selectable — selection needs __cum >= 1), so a group
    whose values are all null still emits a row with null quantiles,
    exactly like SQL GROUP BY + quantile_cont. Filtering first silently
    DROPPED such groups, contradicting the oracle.
    """
    val = value if isinstance(value, Column) else F.col(value)
    return (
        df.groupBy(*group_cols, val.alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )


def _ranged_cumulative(
    hist: DataFrame,
    part_cols: list[str],
    order_col: str = "__v",
    count_col: str = "__c",
    partitions: int | None = None,
) -> DataFrame:
    """hist + (__cum, __n): cumulative non-null weight within ``part_cols``
    ordered by ``order_col``, computed at FULL cluster parallelism.

    A plain ``Window.partitionBy(part_cols).orderBy(order_col)`` cumsum
    parallelizes only to the partition-key cardinality (3 ``l_returnflag``
    values → 3 tasks; AQE byte-coalescing makes it worse, merging the
    histogram exchange down to ~2 tasks at 16 MB advisory while the stage
    carries most of the query's CPU). This is the ``exact_ntile`` pattern
    applied to grouped histograms instead:

    1. ``repartitionByRange(p, *part_cols, order_col)`` — a distributed
       sort shuffle; p from ``spark.sql.shuffle.partitions`` (scale-
       adaptive, never a local constant).
    2. Per-(physical partition, part_cols) weight subtotals → cumulative
       offsets + per-group totals, computed from the PERSISTED ranged
       frame (range bounds are *sampled*, so a branch that re-executed
       the exchange could re-sample different bounds and mis-assign
       offsets; materializing the frame once makes both branches read
       the same physical partitioning by construction, not by hoping
       ReuseExchange fires) and broadcast back (≤ p × |groups| rows).
    3. Local window cumsum per (partition, part_cols) + the offset =
       exact global cumulative count. The window needs clustering on
       (__pid, part_cols), which the range partitioning cannot prove, so
       an EXPLICIT ``repartition(p, ...)`` provides it — explicit-count
       repartitions are exempt from AQE byte-coalescing, keeping the
       sort/window/final-aggregate stage at p-way parallelism.

    Null ``order_col`` rows carry zero weight (they sort first and their
    cumulative count stays 0 — never selectable, still emitted).
    """
    sess = hist.sparkSession
    if partitions is not None:
        p = int(partitions)
    else:
        try:
            p = int(sess.conf.get("spark.sql.shuffle.partitions"))
        except ValueError:  # e.g. "auto" on AQE-managed platforms
            p = sess.sparkContext.defaultParallelism
    w = (F.when(F.col(order_col).isNotNull(), F.col(count_col))
         .otherwise(F.lit(0)))
    # PERSIST the ranged frame: __pid comes from spark_partition_id()
    # over SAMPLED range bounds, so the offsets branch and the main
    # branch must see one physical partitioning. Relying on ReuseExchange
    # to share the sampled exchange is plan-inferred and can silently
    # break (exchange reuse disabled, a checkpointed input, AQE
    # canonicalization drift) — materializing the frame once makes the
    # shared partitioning explicit: both branches read the same cached
    # partitions, mis-assigned offsets become impossible by construction.
    from funnel_rocket_spark.operators.dedup import bounded_persist

    ranged = bounded_persist(
        hist.repartitionByRange(p, *part_cols, order_col)
        .withColumn("__pid", F.spark_partition_id()))
    w_off = (Window.partitionBy(*part_cols).orderBy("__pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    w_tot = Window.partitionBy(*part_cols)
    offs = (
        ranged.groupBy("__pid", *part_cols).agg(F.sum(w).alias("__s"))
        .select(
            "__pid", *part_cols,
            F.coalesce(F.sum("__s").over(w_off), F.lit(0)).alias("__off"),
            F.sum("__s").over(w_tot).alias("__n"))
    )
    w_loc = (Window.partitionBy("__pid", *part_cols).orderBy(order_col)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        ranged.join(F.broadcast(offs), ["__pid", *part_cols])
        .repartition(p, "__pid", *part_cols)
        .select(*hist.columns,
                (F.sum(w).over(w_loc) + F.col("__off")).alias("__cum"),
                F.col("__n"))
    )


def grouped_exact_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value,
    quantiles: dict[str, float],
    partitions: int | None = None,
) -> DataFrame:
    """Exact linear-interpolation percentiles of ``value`` per group.

    ``quantiles`` maps output column name → q in [0, 1]. Returns one row per
    group with a double column per requested quantile. Null values are
    ignored (matching ``percentile`` / ``quantile_cont``); a group whose
    values are all null yields nulls. ``partitions`` opts in to the
    distributed cumulative pass (see :func:`percentiles_from_histogram`).
    """
    hist = grouped_value_histogram(df, group_cols, value)
    return percentiles_from_histogram(hist, group_cols, quantiles,
                                      partitions=partitions)


def percentiles_from_histogram(
    hist: DataFrame,
    group_cols: list[str],
    quantiles: dict[str, float],
    partitions: int | None = None,
) -> DataFrame:
    """Quantiles from a ``(groups..., __v, __c)`` value histogram (the
    :func:`grouped_value_histogram` shape) — the tail of
    :func:`grouped_exact_percentiles`, exposed so a caller that also
    needs the histogram itself (e.g. a winsorized mean over the same
    values) computes it ONCE and shares the exchange.

    Cumulative-count strategy: by default, one windowed pass partitioned
    by the group keys — ONE histogram exchange, parallelism capped at
    group-key cardinality. Pass ``partitions`` to switch to the
    distributed range-partitioned cumsum (:func:`_ranged_cumulative`)
    when a per-group histogram is itself whale-sized. The distributed
    form was A/B-measured as a LOSS on the catalog queries at sf0.1
    (olap_percentiles 1.45 → 2.51 s, behavior_funnel_step_timing
    0.65 → 1.56 s, min-of-3 interleaved, quiet box): its extra histogram
    exchange + offsets branch + broadcast cost more than the added
    parallelism buys until the per-group histogram far exceeds the
    advisory partition size — so it is opt-in, not the default.
    """
    for name, q in quantiles.items():
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {name}={q} outside [0, 1]")
    if partitions is not None:
        h = _ranged_cumulative(hist, group_cols, partitions=partitions)
    else:
        nn_c = (F.when(F.col("__v").isNotNull(), F.col("__c"))
                .otherwise(F.lit(0)))
        w_cum = (
            Window.partitionBy(*group_cols)
            .orderBy("__v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # __n rides the SAME (partition, order) spec with an unbounded
        # frame: WindowExec groups frames by (partitionBy, orderBy), so
        # both sums run in ONE Window operator / one pass over the
        # sorted histogram — a spec without orderBy planned as a second
        # WindowExec re-iterating every row (same values either way:
        # the unbounded frame covers the whole group). A/B at sf0.1 is a
        # wash (the histogram is small); the point is one pass instead
        # of two over a histogram that scales with the data.
        w_all = (Window.partitionBy(*group_cols).orderBy("__v")
                 .rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing))
        h = hist.select(
            *hist.columns,
            F.sum(nn_c).over(w_cum).alias("__cum"),
            F.sum(nn_c).over(w_all).alias("__n"),
        )

    aggs = []
    for name, q in quantiles.items():
        pos = F.lit(q) * (F.col("__n") - 1)
        lo, hi = F.floor(pos), F.ceil(pos)
        # the value covering zero-indexed rank r is the first histogram row
        # with cumulative count > r
        v_lo = F.min(F.when(F.col("__cum") >= lo + 1, F.col("__v")))
        v_hi = F.min(F.when(F.col("__cum") >= hi + 1, F.col("__v")))
        frac = F.min(pos - lo)  # per-group constant
        aggs.append(
            (v_lo.cast("double") + frac * (v_hi - v_lo).cast("double")).alias(name)
        )
    return h.groupBy(*group_cols).agg(*aggs)


def grouped_exact_percentiles_multi(
    df: DataFrame,
    group_cols: list[str],
    values: dict[str, Column | str],
    quantiles: dict[str, tuple[str, float]],
) -> DataFrame:
    """Exact percentiles over SEVERAL value expressions in ONE scan and
    ONE histogram exchange.

    ``values`` maps value-name → column (computed as double); ``quantiles``
    maps output column → ``(value-name, q)``, so several quantiles can
    share one value's histogram. Per-value semantics match
    :func:`grouped_exact_percentiles` (nulls ignored, linear
    interpolation — DuckDB ``quantile_cont``-equal on exactly-
    representable doubles).

    Physical shape: the value exprs STACK via ``explode(array(struct(
    vid, v)))`` into (group, vid, v) rows — still one pass over the
    input — then one partially-aggregated histogram groupBy, rank
    windows partitioned by (group, vid), and a final groupBy(group)
    whose aggregates each filter on their vid. Measuring a second (or
    fifth) column costs a constant factor on the same pass, where
    calling the single-value operator per column costs a full extra
    scan + shuffle + join each time (same-session A/B on the catalog's
    olap_percentiles at sf0.1: 2.03 s two-call form → 1.81 s stacked;
    the win grows with the number of measured columns and with input
    width, since the saved scans dominate at scale).

    Note: returns every group present in ANY value's rows (outputs null
    where a value has no rows for that group); an inner join of
    single-value results would instead drop such groups.
    """
    names = list(values)
    vid_of = {n: i for i, n in enumerate(names)}
    for out, (vn, q) in quantiles.items():
        if vn not in vid_of:
            raise ValueError(f"quantile {out} references unknown value {vn!r}")
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {out}={q} outside [0, 1]")

    def _col(v):
        return (v if isinstance(v, Column) else F.col(v)).cast("double")

    stacked = F.array(*[
        F.struct(F.lit(i).alias("__vid"), _col(values[n]).alias("__v"))
        for i, n in enumerate(names)])
    ex = (df.select(*group_cols, F.explode(stacked).alias("__s"))
          .select(*group_cols, F.col("__s.__vid").alias("__vid"),
                  F.col("__s.__v").alias("__v"))
          .where(F.col("__v").isNotNull()))
    hist = (ex.groupBy(*group_cols, "__vid", "__v")
            .agg(F.count(F.lit(1)).alias("__c")))
    w_cum = (Window.partitionBy(*group_cols, "__vid").orderBy("__v")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # same-spec unbounded frame -> one WindowExec (see
    # percentiles_from_histogram)
    w_all = (Window.partitionBy(*group_cols, "__vid").orderBy("__v")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    h = hist.select(*group_cols, "__vid", "__v",
                    F.sum("__c").over(w_cum).alias("__cum"),
                    F.sum("__c").over(w_all).alias("__n"))
    aggs = []
    for out, (vn, q) in quantiles.items():
        this = F.col("__vid") == vid_of[vn]
        pos = F.lit(q) * (F.col("__n") - 1)
        lo, hi = F.floor(pos), F.ceil(pos)
        v_lo = F.min(F.when(this & (F.col("__cum") >= lo + 1), F.col("__v")))
        v_hi = F.min(F.when(this & (F.col("__cum") >= hi + 1), F.col("__v")))
        frac = F.min(F.when(this, pos - lo))
        aggs.append((v_lo + frac * (v_hi - v_lo)).alias(out))
    return h.groupBy(*group_cols).agg(*aggs)


def exact_ntile(df: DataFrame, n: int, order_cols: list[Column | str],
                partitions: int | None = None,
                out_col: str = "bucket") -> DataFrame:
    """Exact global ``ntile(n)`` without the single-partition window trap.

    ``ntile`` over ``Window.orderBy(...)`` (no partitionBy) funnels the
    ENTIRE dataset through one task — the classic Spark cluster-killer for
    global ranking. This formulation keeps every step distributed:

    1. ``repartitionByRange`` on the order columns — a distributed sort
       shuffle; ranges sampled, data spread over ``partitions`` tasks.
    2. Per-partition row counts (a tiny ``spark_partition_id`` aggregate,
       ~#partitions rows) → cumulative offsets, broadcast back.
    3. ``row_number`` windowed *per partition* (distributed) + the
       partition's offset = exact global rank; total N rides the same
       broadcast.
    4. ntile bucket from (rank, N) arithmetic, matching SQL semantics
       bit-for-bit: with N = n*q + r, the first r buckets get q+1 rows.

    The offsets are computed IN-PLAN from the same range exchange the final
    ranking reads (both branches share one canonicalized shuffle →
    ReusedExchange), never via a separate collect job: range bounds are
    *sampled*, so a second job over nondeterministically-ordered upstream
    rows (e.g. a hash aggregate) can re-sample different bounds, and
    offsets measured on partitioning A applied to partitioning B yield
    phantom ranks > N (observed as an 11th decile of size 1). One action =
    one exchange = one consistent partitioning. Order must be total
    (include a unique tie-break column) for deterministic buckets.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    p = partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = (df.repartitionByRange(int(p), *cols)
              .withColumn("__pid", F.spark_partition_id()))
    # per-partition sizes → cumulative offsets + grand total. ~p rows, so
    # the single-partition windows are trivial; the broadcast back to the
    # big side is p rows too.
    w_cum = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    offsets = (
        ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
        .select(
            "__pid",
            F.coalesce(F.sum("__c").over(w_cum), F.lit(0)).alias("__off"),
            F.sum("__c").over(w_all).alias("__n")))
    w = Window.partitionBy("__pid").orderBy(*cols)
    joined = ranged.join(F.broadcast(offsets), "__pid")
    rank = F.col("__rank")
    q = F.floor(F.col("__n") / n)          # small-bucket size
    r = F.col("__n") % n                   # number of (q+1)-sized buckets
    # first r buckets have q+1 rows; ranks beyond r*(q+1) fall into q-sized
    # buckets (guard q == 0: fewer rows than buckets → bucket == rank)
    big_span = r * (q + 1)
    bucket = (
        F.when(rank <= big_span, F.ceil(rank / (q + 1)))
        .when(q > 0, r + F.ceil((rank - big_span) / q))
        .otherwise(rank))
    return (joined
            .withColumn("__rank",
                        F.row_number().over(w) + F.col("__off"))
            .withColumn(out_col, bucket.cast("int"))
            .drop("__pid", "__rank", "__off", "__n", "__c"))


def rolling_time_agg(df: DataFrame, ts_col: str, value_col: str,
                     window_periods: int = 7,
                     period: str = "day",
                     group_cols: list[str] | None = None) -> DataFrame:
    """Pre-aggregated rolling time-window metrics, e.g. 7-day rolling
    revenue: (period_start[, groups...], value, rolling_sum, rolling_avg).

    The scale trick is the ORDER of operations: aggregate to one row per
    (period[, groups]) FIRST — a map-side-combinable shuffle over the full
    data — and only then run the rolling window over the shrunken series
    (|periods| × |groups| rows, years of daily data ≈ thousands of rows).
    A rolling window DIRECTLY over raw rows would funnel everything
    through one task per group; over the pre-aggregate it's negligible.
    ``range_between`` on the integer period index handles gaps (missing
    days widen the wall-clock window but never silently include extra
    periods).

    ``ts_col`` must be date/timestamp-typed (period truncation via
    date_trunc keeps the scan column pushdown-friendly upstream).
    """
    group_cols = group_cols or []
    bucket = F.date_trunc(period, F.col(ts_col))
    per_period = (
        df.groupBy(bucket.alias("period_start"),
                   *[F.col(c) for c in group_cols])
        .agg(F.sum(value_col).alias("value"))
    )
    # integer index for RANGE frames: days since epoch (day/week) or
    # months since epoch (month) — gap-aware, engine-portable
    if period in ("day", "week"):
        idx = F.datediff(F.col("period_start"), F.lit("1970-01-01"))
        span = window_periods * (7 if period == "week" else 1) - 1
    elif period == "month":
        idx = (F.year("period_start") * 12 + F.month("period_start"))
        span = window_periods - 1
    else:
        raise ValueError(f"unsupported period: {period!r}")
    w = (Window.partitionBy(*[F.col(c) for c in group_cols])
         .orderBy(idx)
         .rangeBetween(-span, 0)) if group_cols else (
        Window.orderBy(idx).rangeBetween(-span, 0))
    return per_period.select(
        "period_start", *group_cols,
        F.round("value", 2).alias("value"),
        F.round(F.sum("value").over(w), 2).alias("rolling_sum"),
        F.round(F.avg("value").over(w), 4).alias("rolling_avg"),
    )


def window_share(df: DataFrame, part_cols: list[str], within_cols: list[str],
                 value_col: str) -> DataFrame:
    """Contribution share: value per ``part_cols``, plus its fraction of
    the ``within_cols`` total — (parts..., value, share).

    One aggregation shuffle on (within ∪ part); the share itself is a
    window SUM over the aggregate, which has |parts| rows per ``within``
    group — trivially small after the pre-agg, never over raw data.
    """
    agg = (df.groupBy(*[F.col(c) for c in within_cols + part_cols])
           .agg(F.sum(value_col).alias("__v")))
    w = Window.partitionBy(*[F.col(c) for c in within_cols])
    # nullif guard: a zero within-group total (all-zero revenue, refunds
    # cancelling sales) is a null share, not an ANSI DIVIDE_BY_ZERO that
    # kills the query — same guard similarity.py uses for cosine norms
    total = F.sum("__v").over(w)
    return agg.select(
        *within_cols, *part_cols,
        F.round("__v", 2).alias("value"),
        F.round(F.col("__v") / F.nullif(total, F.lit(0)), 6).alias("share"),
    )


def basket_pairs(df: DataFrame, basket_col: str, item_col: str,
                 min_support: int = 2, top: int = 50) -> DataFrame:
    """Co-occurrence mining: item pairs appearing in the same basket —
    (item_a, item_b, n_baskets), most frequent first.

    Pipeline: distinct (basket, item) → self-join on basket with
    ``item_a < item_b`` → count per pair. The join explodes each basket
    quadratically, but baskets are naturally SMALL (line items per order);
    cost is Σ|basket|² — linear-ish in practice. Pathological mega-baskets
    are the skew risk: cap them upstream or let AQE skew-split the join.
    A min_support filter + top-k keeps the result bounded.

    ONE exchange serves the distinct AND both self-join sides (r12): an
    explicit hash repartition on the basket key satisfies the distinct's
    (basket, item) clustering (hash on a key subset) and the join's, so
    the aliased sides read the same exchange (ReusedExchange) with no
    re-shuffle. Map-side partial dedup is traded away — (basket, item)
    is nearly distinct per row in basket data, so the raw shuffle costs
    the same bytes. 1.34 → 0.93 s at sf0.1 (min-of-4 interleaved,
    values identical).
    """
    bi = (df.select(F.col(basket_col).alias("__b"),
                    F.col(item_col).alias("__i"))
          .repartition(F.col("__b"))
          .distinct())
    a, b = bi.alias("a"), bi.alias("b")
    return (
        a.join(b, F.col("a.__b") == F.col("b.__b"))
        .where(F.col("a.__i") < F.col("b.__i"))
        .groupBy(F.col("a.__i").alias("item_a"),
                 F.col("b.__i").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_support)
        .orderBy(F.desc("n_baskets"), F.asc("item_a"), F.asc("item_b"))
        .limit(top)
    )
