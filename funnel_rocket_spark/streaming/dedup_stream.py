"""Streaming exact deduplication: content-digest dropDuplicates with a
watermark-bounded state store.

EXTENSION beyond the reference (funnel-rocket is strictly batch). This is
the continuous twin of ``operators.dedup.exact_duplicates``: an unbounded
document stream is filtered to first-seen content, where "seen" is an
md5 digest of the normalized text — the same normalization (lowercased
whitespace tokens) the batch dedup family uses, so a doc dropped here is
exactly a doc the batch pipeline would have clustered.

Scale notes: state is keyed by the digest — uniformly distributed by
construction, no skew. ``dropDuplicatesWithinWatermark`` evicts digest
state older than the watermark delay, so memory is bounded by the duplicate
arrival window rather than the stream's lifetime (a true global-history
dedup at 100 TB belongs in the batch pipeline; the stream layer catches
the near-in-time duplicates that dominate crawl feeds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from funnel_rocket_spark.operators.dedup import tokens


def content_digest(col) -> F.Column:
    """md5 over the normalized (lowercased, whitespace-split) token stream —
    identical to the batch ``exact_duplicates`` digest."""
    return F.md5(F.concat_ws(" ", tokens(col)).cast("binary"))


def streaming_exact_dedup(docs: DataFrame, ts_col: str,
                          text_col: str = "text",
                          watermark: str = "10 minutes") -> DataFrame:
    """Streaming DF → rows whose content digest was not seen within the
    watermark window. ``ts_col`` must be TimestampType (event time).

    Emits each distinct content exactly once per watermark window; exact
    within the window, best-effort across windows (state eviction is the
    price of bounded memory on an unbounded stream).
    """
    with_digest = docs.withColumn("__digest", content_digest(F.col(text_col)))
    return (with_digest
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["__digest"])
            .drop("__digest"))
