"""Per-group top-k / best-row selection.

The reference has only a global per-value top-K trim (SURVEY §2.7,
`query_engine.py:262-281`); per-GROUP ranking doesn't exist there at all.
It is, however, the workhorse selection step of a curation pipeline: "keep
the 3 longest documents per language", "keep the best-quality document of
each duplicate cluster". Both are one rank-window here.

Scale shape: a rank window needs one hash exchange on the group key plus a
per-partition sort — same cost as any groupBy on that key. Spark inserts a
WindowGroupLimit (rank pushdown) node for `row_number() <= k` filters, so
each map task keeps only k rows per group BEFORE the shuffle; the exchange
carries O(groups · k) rows, not the full table. No collect, no skew beyond
what the key itself has.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(df: DataFrame, group_cols: Sequence[str],
                    order_by: Sequence[Column], k: int,
                    rank_col: Optional[str] = "rnk") -> DataFrame:
    """Keep the first ``k`` rows of each group under ``order_by``.

    ``order_by`` must be a total order within every group (add a unique
    tie-break column!) or the selected set is nondeterministic. Emits the
    1-based rank as ``rank_col`` (pass None to drop it).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    ranked = df.withColumn("__rnk", F.row_number().over(w))
    out = ranked.filter(F.col("__rnk") <= k)
    if rank_col is None:
        return out.drop("__rnk")
    return out.withColumnRenamed("__rnk", rank_col)


def keep_best(df: DataFrame, group_cols: Sequence[str],
              order_by: Sequence[Column]) -> DataFrame:
    """The single best row of each group under ``order_by`` — top_k with k=1
    and no rank column. E.g. the representative of a duplicate cluster:
    ``keep_best(docs, ["cluster_id"], [F.desc("quality"), F.asc("doc_id")])``.
    """
    return top_k_per_group(df, group_cols, order_by, 1, rank_col=None)
