"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

All pure JVM Column expressions (regexp/split/aggregate) — designed so an
ANSI-SQL oracle reproduces values bit-for-bit (ratios rounded to 6 places).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from funnel_rocket_spark.operators._litexpr import (lit_double_map,
                                                    lit_str_array)
from funnel_rocket_spark.operators.dedup import tokens

# Tiny per-language stopword lists for the n-gram/stopword heuristic language
# ID. Deliberately small + deterministic; replace with fastText & co. in a
# real deployment (kept dependency-free here).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "im", "ein"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "dans", "que", "pour"],
}


def token_count(col):
    """Whitespace token count — the cheap proxy; see bpe_token_estimate."""
    return F.size(tokens(col, lowercase=False))


def bpe_token_estimate(col):
    """BPE-ish token-count estimate: word-pieces + digits + punctuation runs.

    A regex approximation of a GPT-style tokenizer's piece count (useful for
    budget estimation over a corpus without shipping a tokenizer model):
    pieces of ≤4 word chars, digit runs, and individual punctuation marks.
    """
    pieces = F.regexp_extract_all(
        F.lower(col), F.lit(r"[a-z]{1,4}|[0-9]|[^a-z0-9\s]"), 0
    )
    return F.size(pieces)


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document stats: chars, tokens, mean token length, punct/digit/space
    ratios. One narrow projection — no shuffle at all."""
    col = F.col(text_col)
    n_chars = F.length(col)
    n_tokens = token_count(col)
    n_punct = F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    n_digit = F.length(col) - F.length(F.regexp_replace(col, r"[0-9]", ""))
    n_space = F.length(col) - F.length(F.regexp_replace(col, r"\s", ""))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 6).alias("chars_per_token"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_digit / F.greatest(n_chars, F.lit(1)), 6).alias("digit_ratio"),
        F.round(n_space / F.greatest(n_chars, F.lit(1)), 6).alias("space_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality score in [0,1]: length band + stopword presence −
    punctuation/digit noise. The shape of C4/Gopher-style quality filters,
    deterministic and oracle-checkable."""
    col = F.col(text_col)
    toks = tokens(col)
    n_tokens = F.size(toks)
    n_chars = F.length(col)
    stop_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS["en"]])))
    punct_ratio = (n_chars - F.length(F.regexp_replace(col, r"[^\w\s]", ""))) / F.greatest(n_chars, F.lit(1))
    digit_ratio = (n_chars - F.length(F.regexp_replace(col, r"[0-9]", ""))) / F.greatest(n_chars, F.lit(1))
    length_score = F.when((n_tokens >= 10) & (n_tokens <= 100000), 0.4).otherwise(0.1)
    stop_score = F.when(stop_hits >= 2, 0.3).when(stop_hits == 1, 0.15).otherwise(0.0)
    noise_penalty = F.round(punct_ratio * 0.5 + digit_ratio * 0.5, 6)
    score = F.round(length_score + stop_score + F.lit(0.3) - noise_penalty, 6)
    return df.select(
        F.col(id_col),
        F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0)).alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID: score per language = count of that
    language's stopwords among the doc's tokens; argmax wins, 'und'
    (undetermined) when all scores are 0. Ties break by language code order —
    deterministic for the oracle."""
    toks = tokens(F.col(text_col))
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias(lang)
        for lang, words in sorted(STOPWORDS.items())
    ]
    scored = df.select(F.col(id_col), *scores)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(lang) for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties → apply in reverse
        pred = F.when((F.col(lang) == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return scored.select(F.col(id_col), pred.alias("lang_pred"))


def _contiguous_ngrams(toks, n: int):
    """ALL contiguous word n-grams (duplicates kept), as one JVM expression.

    Built by zip_with over n shifted slices of the token array rather than
    ``transform(sequence(...))``: a lambda that captures the token subtree
    re-evaluates it once PER GRAM (interpreted, quadratic re-splitting),
    while here the token array is evaluated a constant n+1 times per row.
    """
    cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    grams = F.slice(toks, 1, cnt)
    for k in range(1, n):
        grams = F.zip_with(
            grams, F.slice(toks, k + 1, cnt),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return grams


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style within-document repetition signals: the fraction of
    tokens / 2-grams / 3-grams that are duplicates of an earlier occurrence
    in the same document. High values flag boilerplate and degenerate
    machine-generated text (Rae et al. 2021 §A1.1 use the same family of
    duplicate-n-gram filters).

    Pure per-row column math — no shuffle, no UDF; scales linearly with
    corpus size and stays partition-local at 100 TB.
    """
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)

    def dup_frac(arr):
        n = F.size(arr)
        return F.round(
            (n - F.size(F.array_distinct(arr))) / F.greatest(n, F.lit(1)), 6)

    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        dup_frac(toks).alias("dup_token_frac"),
        dup_frac(_contiguous_ngrams(toks, 2)).alias("dup_2gram_frac"),
        dup_frac(_contiguous_ngrams(toks, 3)).alias("dup_3gram_frac"),
    )


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", max_tokens: int = 2048,
                    stride: int | None = None) -> DataFrame:
    """Split each document into fixed-size token windows — the
    chunk/packing step of a training-data pipeline (context-length
    budgeting, optionally overlapping windows for retrieval corpora).

    Returns (id, chunk_id, n_chunk_tokens, chunk_text); every document
    yields at least one chunk (an empty doc yields one empty chunk, so no
    rows are silently dropped).

    Scale shape: tokenize once per document in the projection BELOW the
    Generate (explode) node, then slice the carried token array once per
    chunk row — no shuffle, no UDF, output cardinality ~n_tokens/stride per
    doc. ``stride < max_tokens`` gives overlapping windows.
    """
    if stride is None:
        stride = max_tokens
    if stride <= 0 or max_tokens <= 0:
        raise ValueError("max_tokens and stride must be positive")
    # lowercase=False: chunks are TRAINING TEXT — reconstruction must
    # preserve the original casing (normalized tokenization is for
    # counting/matching operators, not for text that flows onward)
    toks_df = df.select(
        F.col(id_col), tokens(F.col(text_col), lowercase=False)
        .alias("__toks"))
    n_tok = F.size("__toks")
    # windows fully covering the doc: ceil((n - max)/stride) + 1, min 1
    n_chunks = F.greatest(
        F.ceil((n_tok - F.lit(max_tokens)) / F.lit(float(stride))) + 1,
        F.lit(1),
    )
    exploded = toks_df.select(
        F.col(id_col), "__toks",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int")))
         .alias("chunk_id"),
    )
    window = F.slice(F.col("__toks"),
                     F.col("chunk_id") * stride + 1, max_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.size(window).alias("n_chunk_tokens"),
        F.concat_ws(" ", window).alias("chunk_text"),
    )


def vocabulary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               min_count: int = 1, top: int | None = None) -> DataFrame:
    """Corpus vocabulary: (token, n_occurrences, n_docs), descending by
    count — the frequency table behind vocab construction / min-frequency
    filtering in a tokenizer-training pipeline.

    Scale shape: explode tokens → one groupBy(token) with map-side partial
    aggregation (the explode never shuffles raw text, only tokens); n_docs
    rides the same aggregate as a conditional count over per-doc distinct
    tokens, avoiding a second pass. Hot-token skew is absorbed by the
    partial aggregates (each map task emits one row per distinct token).
    Ties order by token for determinism.
    """
    # ONE scan of the text, two chained aggregates — both map-side
    # combinable, no countDistinct expand: per-(token, doc) counts collapse
    # within-doc repeats at the mappers; the second agg then reads
    # occurrences as a sum and doc-frequency as a plain row count.
    per_doc = (
        df.select(F.col(id_col).alias("__doc"),
                  F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token", "__doc").agg(F.count(F.lit(1)).alias("__c"))
    )
    out = (
        per_doc.groupBy("token")
        .agg(F.sum("__c").alias("n_occurrences"),
             F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_occurrences") >= min_count)
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
    )
    return out.limit(top) if top else out


def pack_token_blocks(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", block_size: int = 512,
                      shards: int = 8,
                      pretokenized_col: str | None = None) -> DataFrame:
    """GPT-style sequence packing: concatenate every document's tokens (in
    ``id_col`` order) and split the stream into consecutive blocks of
    exactly ``block_size`` tokens — documents span block boundaries, the
    standard concat-then-chunk step that turns a filtered corpus into
    fixed-length training sequences.

    A single global stream would serialize on one task, so the corpus is
    ``shards``-way hash-sharded on the id (each shard is an independent
    token stream packed separately — at 100 TB, shards ≈ cluster
    parallelism and every shard packs locally after ONE window exchange).
    Returns one row per (shard, block_id): contributing doc count, token
    count (== block_size except each shard's tail block), and an md5 over
    the block's space-joined tokens for bit-level verification.

    ``pretokenized_col`` packs an existing ``array<string>`` token column
    instead of whitespace words — e.g. ``split(bpe_text, ' ')`` from
    :func:`bpe_tokenize` — so blocks are exactly ``block_size`` TRUE
    tokenizer tokens, completing the exact-count path that
    ``mixture_plan(token_col=...)`` starts.
    """
    if block_size <= 0 or shards <= 0:
        raise ValueError("block_size and shards must be positive")
    B = block_size
    # lowercase=False: packed blocks are training text + a bit-level md5 —
    # both must carry the ORIGINAL casing
    toks = (F.col(pretokenized_col) if pretokenized_col is not None
            else tokens(F.col(text_col), lowercase=False))
    # md5-hash sharding (the sample_gate/_md5_bucket construction, DuckDB-
    # portable): raw pmod(id, shards) crashed with CAST_INVALID_INPUT on
    # string ids under ANSI and left shards empty for structured numeric
    # ids (e.g. all-even)
    shard = F.pmod(
        F.conv(F.substring(
            F.md5(F.col(id_col).cast("string").cast("binary")), 1, 11),
            16, 10).cast("long"), F.lit(shards))
    base = (
        df.select(
            shard.alias("shard"),
            F.col(id_col).alias("__id"),
            toks.alias("__toks"))
        .withColumn("__n", F.size("__toks"))
    )
    w = (Window.partitionBy("shard").orderBy("__id")
         .rowsBetween(Window.unboundedPreceding, -1))
    # The zero-token filter sits ABOVE the window, not on `base`: below it,
    # PushDownPredicates substitutes `size(tokens(text)) > 0` into a scan-
    # side predicate that re-runs the tokenizer on the file's 1-2 input
    # splits (then again in the projection). Zero-token docs add 0 to every
    # prefix sum, so letting them ride the one window exchange and dropping
    # them just before the explode yields bit-identical blocks — the filter
    # can't push through the window (``__n`` is not a partition key).
    placed = base.withColumn(
        "__start", F.coalesce(F.sum("__n").over(w), F.lit(0))).filter(
        F.col("__n") > 0)
    exploded = placed.withColumn(
        "block_id",
        F.explode(F.sequence(
            F.floor(F.col("__start") / B),
            F.floor((F.col("__start") + F.col("__n") - 1) / B))))
    local_start = F.greatest(F.col("block_id") * B - F.col("__start"), F.lit(0))
    local_end = F.least(F.col("__n"),
                        (F.col("block_id") + 1) * B - F.col("__start"))
    chunked = exploded.select(
        "shard", "block_id", "__id",
        (local_end - local_start).alias("__ct"),
        F.concat_ws(" ", F.slice("__toks", local_start + 1,
                                 local_end - local_start)).alias("__chunk"),
    )
    ordered_chunks = F.transform(
        F.array_sort(F.collect_list(F.struct("__id", "__chunk"))),
        lambda x: x["__chunk"])
    return (
        chunked.groupBy("shard", "block_id")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("__ct").alias("n_tokens"),
             F.md5(F.concat_ws(" ", ordered_chunks).cast("binary"))
             .alias("block_md5"))
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    lowercase token set. Rabin-style content fingerprinting for fast
    equality-after-normalization checks."""
    toks = F.array_sort(F.array_distinct(tokens(F.col(text_col))))
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", toks).cast("binary")).alias("fingerprint"),
    )


# PII patterns chosen to be valid in BOTH Java regex (Spark) and RE2
# (DuckDB/Go) so the operator is oracle-checkable: no backrefs, no
# lookaround. Order matters — emails are redacted before the phone pattern
# can eat digit runs inside them.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{1,3}[-. ]\d{2,4}[-. ]\d{3,4}[-. ]?\d{0,4}", "<PHONE>"),
]


def redact_pii(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Training-data PII scrub: emails / IPv4s / phone-shaped digit runs
    replaced with typed placeholder tokens → (id, redacted, n_redactions).

    Pure regexp_replace projection — zero shuffle, whole-stage codegen,
    linear at any corpus size. ``n_redactions`` (count of placeholder
    tokens emitted) gives the audit trail a curation pipeline logs; route
    docs with extreme counts to review rather than silently keeping them.
    Patterns deliberately avoid lookaround/backrefs so the same strings
    run on RE2 engines (the DuckDB differential oracle runs them verbatim).
    """
    redacted = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, repl)
    n = sum(
        (F.length(redacted) - F.length(F.replace(redacted, F.lit(repl), F.lit(""))))
        / F.lit(len(repl))
        for _, _, repl in PII_PATTERNS
    )
    return df.select(
        F.col(id_col),
        redacted.alias("redacted"),
        n.cast("long").alias("n_redactions"),
    )


def tfidf_top_terms(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", top: int = 5) -> DataFrame:
    """Per-document top-``top`` terms by TF-IDF — the keyword-extraction /
    relevance-weighting step of a curation pipeline. Plain formula, no
    smoothing: tf = count/doc_len, idf = ln(N/df), both factors exact.

    Scale shape: one (doc, token) aggregate feeds BOTH term frequencies and
    (via a second shrinking aggregate) document frequencies; the df table
    joins back on token — an aggregate-to-aggregate shuffle join, never the
    raw corpus. Corpus size N rides a broadcast single-row frame, so the
    whole plan stays lazy (no driver-side count). Ranking windows partition
    by doc — fully distributed. Scores rounded to 6 places BEFORE ranking
    so the top-k frontier is reproducible across engines.
    """
    tf = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("__n"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    doc_w = Window.partitionBy("doc_id")
    scored = (
        tf.withColumn("__len", F.sum("tf").over(doc_w))
        .join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round((F.col("tf") / F.col("__len"))
                    * F.log(F.col("__n") / F.col("df")), 6))
    )
    rank_w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("term_rank", F.row_number().over(rank_w))
        .filter(F.col("term_rank") <= top)
        .select("doc_id", "term_rank", "token", "tf", "tfidf")
    )


def token_entropy(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document Shannon entropy of the token distribution (nats):
    (doc_id, n_tokens, entropy). A cheap perplexity proxy — gibberish and
    boilerplate both sit at the entropy extremes, so curation pipelines
    band on it next to quality_score.

    H = ln(n) - Σ c·ln(c) / n over per-token counts c. Two shuffles, both
    map-side combinable: (doc, token) counts, then a per-doc sum — the
    same first aggregate tfidf_top_terms builds (one materialized
    (doc, token) frame serves both in a combined pipeline). Documents
    with zero tokens are excluded (H undefined).
    """
    tc = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = tc.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.log("c")).alias("s"))
    return per_doc.select(
        "doc_id", F.col("n").cast("long").alias("n_tokens"),
        F.round(F.log("n") - F.col("s") / F.col("n"), 6).alias("entropy"))


def exact_substring_spans(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          window: int = 20,
                          fingerprint: str = "xxhash64") -> DataFrame:
    """ExactSubstr-style duplicate-span detection (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", 2021):
    fingerprint every ``window``-token sliding window; a window whose
    fingerprint occurs ≥ 2 times ANYWHERE in the corpus is duplicated
    material; overlapping/adjacent duplicate windows merge into maximal
    per-doc token spans → (id, span_start, span_end, n_windows), 1-based
    inclusive token indexes.

    The reference implementation builds a corpus-wide suffix array — a
    global sort. Here the global structure is ONE exchange on the window
    fingerprint (count-over-hash window function: no self-join, no
    groupBy + rejoin), followed by a per-doc exchange for span merging.
    Window texts are fingerprinted via slice+concat (O(n·window); a
    Karp–Rabin rolling hash would be O(n) but not bit-reproducible in
    ANSI SQL). Collisions only ever ADD a spurious span, never drop one.

    ``fingerprint`` picks the hash. ``"xxhash64"`` (default) keys the
    exchange with 8-byte longs — the production choice: at the 2M-doc
    scale rung the 32-char md5 HEX keys made the fingerprint window's
    sort spill (212 s; same plan on long keys: 35 s, back on the linear
    slope). ``"md5"`` stays bit-reproducible in any SQL engine — the
    differential-oracle twin.
    """
    from pyspark.sql import Window as W

    if fingerprint not in ("xxhash64", "md5"):
        raise ValueError(
            f"fingerprint must be xxhash64|md5: {fingerprint!r}")
    toks_df = df.select(F.col(id_col).alias("id"),
                        tokens(F.col(text_col)).alias("tk"))
    # sequence(1, size-window+1); guarded — sequence(1, 0) would count DOWN
    starts = F.when(
        F.size("tk") >= window,
        F.sequence(F.lit(1), F.size("tk") - F.lit(window - 1))
    ).otherwise(F.array().cast("array<int>"))
    win_text = F.concat_ws(
        " ", F.slice(F.col("tk"), F.col("start"), window))
    fp = (F.xxhash64(win_text) if fingerprint == "xxhash64"
          else F.md5(win_text.cast("binary")))
    wins = (toks_df.select("id", "tk", F.explode(starts).alias("start"))
            .select("id", "start", fp.alias("h")))
    dup = (wins.withColumn("c", F.count(F.lit(1)).over(W.partitionBy("h")))
           .where(F.col("c") > 1))
    per_doc = W.partitionBy("id").orderBy("start")
    brk = F.when(
        F.col("start") - F.lag("start", 1).over(per_doc) > window,
        1).otherwise(0)
    return (dup.withColumn("brk", brk)
            .withColumn("island", F.sum("brk").over(per_doc))
            .groupBy("id", "island")
            .agg(F.min("start").alias("span_start"),
                 (F.max("start") + F.lit(window - 1)).alias("span_end"),
                 F.count(F.lit(1)).alias("n_windows"))
            .select(F.col("id").alias(id_col),
                    F.col("span_start").cast("int").alias("span_start"),
                    F.col("span_end").cast("int").alias("span_end"),
                    "n_windows"))


def remove_duplicate_spans(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           window: int = 20,
                           fingerprint: str = "xxhash64") -> DataFrame:
    """The ExactSubstr dedup ACTION: drop every corpus-duplicated token
    span (as found by :func:`exact_substring_spans`) from each document →
    (id, clean_text, n_removed_tokens). Lee et al. 2021 delete the
    duplicated substring from all-but-one occurrence; dropping it from
    every occurrence (as here and in several reproductions) additionally
    de-weights boilerplate — document the choice, it changes corpus
    statistics.

    Plan shape: spans aggregate to one array per doc (small — spans are
    merged maximal islands), broadcast-join back to the corpus, then a
    pure HOF projection filters tokens whose 1-based index falls inside
    any span. Docs with no duplicated span pass through the left join
    untouched. Token-joined text normalizes whitespace (same contract as
    the tokenizer everything else in this module uses).
    """
    spans = (exact_substring_spans(df, text_col, id_col, window,
                                   fingerprint=fingerprint)
             .groupBy(id_col)
             .agg(F.collect_list(F.struct("span_start", "span_end"))
                  .alias("__spans")))
    # span DETECTION is case-normalized (exact_substring_spans' contract),
    # but the spans are TOKEN INDEXES — lowercasing never moves word
    # boundaries, so the reconstruction can and must use the CASED tokens:
    # surviving text keeps its original casing
    toks_df = df.select(F.col(id_col),
                        tokens(F.col(text_col), lowercase=False)
                        .alias("__tk"))
    joined = toks_df.join(spans, id_col, "left")
    # guarded: sequence(1, 0) would count DOWN, and zip_with pads the
    # shorter side with nulls — an empty doc must index to an empty array
    idx_seq = F.when(F.size("__tk") > 0,
                     F.sequence(F.lit(1), F.size("__tk"))
                     ).otherwise(F.array().cast("array<int>"))
    indexed = F.zip_with(
        F.col("__tk"), idx_seq,
        lambda t, i: F.struct(t.alias("t"), i.alias("i")))
    keep = F.filter(
        indexed,
        lambda x: ~F.exists(
            F.coalesce(F.col("__spans"),
                       F.array().cast(
                           "array<struct<span_start:int,span_end:int>>")),
            lambda s: (x["i"] >= s["span_start"])
            & (x["i"] <= s["span_end"])))
    return joined.select(
        F.col(id_col),
        F.concat_ws(" ", F.transform(keep, lambda x: x["t"]))
        .alias("clean_text"),
        (F.size("__tk") - F.size(keep)).alias("n_removed_tokens"))


def classifier_score(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", salt: str = "w",
                     out_col: str = "clf_score") -> DataFrame:
    """Hashing-trick linear classifier inference: (id, clf_score in (0,1)).

    The SHAPE of fasttext/logreg quality-classifier scoring (the
    GPT-3/LLaMA-style "looks like reference text" gate): each token hashes
    to a weight, the document logit is the mean token weight, the score is
    its sigmoid. Pure codegen projection — zero shuffle, linear scan, the
    same plan a real linear model produces when its weight table is a
    broadcast lookup.

    Weights here are md5-derived pseudo-weights (deterministic,
    engine-portable, differential-testable) — in deployment, replace
    ``_token_weight`` with a lookup into trained weights (broadcast join
    on token hash, or a literal array for hashed feature spaces). The
    scoring plumbing, null handling, and score normalization are what the
    swap inherits.
    """

    def _token_weight(tok):
        # md5 prefix → integer in [-1000, 1000] / 1000 — the stand-in for a
        # trained weight table, bit-identical in any engine with md5
        h = F.conv(F.substring(
            F.md5(F.concat(F.lit(salt), tok).cast("binary")), 1, 8),
            16, 10).cast("long")
        return (F.pmod(h, F.lit(2001)) - F.lit(1000)) / F.lit(1000.0)

    tk = _tokens_or_empty(text_col)
    logit = F.aggregate(
        tk, F.lit(0.0), lambda acc, t: acc + _token_weight(t)
    ) / F.greatest(F.size(tk), F.lit(1))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return df.select(F.col(id_col), F.round(score, 6).alias(out_col))


def _tokens_or_empty(text_col: str):
    """Token array with NULL text treated as the empty document, so every
    classifier strategy scores a null-text row sigmoid(0) = 0.5 — without
    the coalesce, the HOF-aggregate path propagated null (null array →
    null logit → null score) while the explode_outer join path yielded
    0.5, breaking the test-pinned strategy-equality contract."""
    return F.coalesce(tokens(F.col(text_col)), F.array().cast("array<string>"))


_CLASSIFIER_MAP_MAX = 2_000  # literal-map entries before the join path


def classifier_score_weights(df: DataFrame, weights: dict,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             out_col: str = "clf_score",
                             default: float = 0.0,
                             strategy: str = "auto") -> DataFrame:
    """TRAINED-weight linear classifier inference — the swap point
    :func:`classifier_score`'s docstring promises: (id, clf_score in
    (0, 1)) from an explicit token→weight table. Same scoring contract as
    the hashing-trick twin (document logit = mean token weight over ALL
    tokens, unknown tokens weigh ``default``; empty document → logit 0 →
    score 0.5), so a trained fasttext/logreg vocabulary drops in without
    changing downstream gates.

    Two physical strategies, chosen by ``strategy="auto"`` on vocabulary
    size (a plan-time Python decision — no probe job):

    * ``"map"`` (≤ ~2k entries): weights fold into a literal map and
      scoring is a pure codegen projection — ZERO shuffle, the same plan
      shape as the hashing twin. Right for hashed feature spaces and
      small gate vocabularies.
    * ``"join"``: explode tokens → broadcast-join the (token, weight)
      table → one groupBy(id) exchange. Right for 100k+ vocabularies,
      where a literal map would blow up the expression tree; the weight
      table broadcasts (vocabularies are MBs, corpora are TBs).

    Strategy equality is test-pinned; the catalog query value-checks the
    join path against a DuckDB oracle carrying the same VALUES table.
    """
    if strategy == "auto":
        strategy = "map" if len(weights) <= _CLASSIFIER_MAP_MAX else "join"
    tk = _tokens_or_empty(text_col)
    if strategy == "map":
        if weights:
            mapping = lit_double_map(sorted(weights.items()))
            # STAGE the literal map as a column: referenced from inside
            # the (interpreted) HOF lambda it would be re-materialized
            # per TOKEN — measured 3.8 s vs 0.24 s warm at sf0.1. As a
            # projected column it is built once per row and each lookup
            # only probes it.
            staged = df.withColumn("__wmap", mapping)
            w_of = lambda t: F.coalesce(  # noqa: E731
                F.element_at(F.col("__wmap"), t), F.lit(float(default)))
        else:
            staged = df
            w_of = lambda t: F.lit(float(default))  # noqa: E731
        logit = F.aggregate(
            tk, F.lit(0.0), lambda acc, t: acc + w_of(t)
        ) / F.greatest(F.size(tk), F.lit(1))
        score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
        return staged.select(F.col(id_col), F.round(score, 6).alias(out_col))
    if strategy != "join":
        raise ValueError(f"strategy must be auto|map|join: {strategy!r}")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        sorted(weights.items()) or [("", 0.0)], "token string, weight double")
    if not weights:
        wdf = wdf.limit(0)
    ex = df.select(F.col(id_col), F.size(tk).alias("__n"),
                   F.explode_outer(tk).alias("__tok"))
    scored = (ex.join(F.broadcast(wdf), ex["__tok"] == wdf["token"], "left")
              .groupBy(id_col)
              .agg(F.max("__n").alias("__n"),
                   F.sum(F.when(F.col("__tok").isNotNull(),
                                F.coalesce(F.col("weight"),
                                           F.lit(float(default))))
                         .otherwise(F.lit(0.0))).alias("__s")))
    logit = (F.coalesce(F.col("__s"), F.lit(0.0))
             / F.greatest(F.col("__n"), F.lit(1)))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return scored.select(F.col(id_col), F.round(score, 6).alias(out_col))


# Gopher rule-set document filter (Rae et al. 2021, appendix A1.1). The
# published thresholds are the defaults; every metric is an exact integer
# ratio (round 6) so a SQL oracle reproduces it bit-for-bit.
GOPHER_REQUIRED_STOPWORDS = [
    "the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_filter(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          min_words: int = 50, max_words: int = 100_000,
                          min_mean_word_len: float = 3.0,
                          max_mean_word_len: float = 10.0,
                          max_symbol_word_ratio: float = 0.1,
                          max_bullet_line_frac: float = 0.9,
                          max_ellipsis_line_frac: float = 0.3,
                          min_alpha_word_frac: float = 0.8,
                          min_stopword_hits: int = 2) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021 A1.1) as ONE
    shuffle-free projection: word-count band, mean word length band,
    symbol-to-word ratio (# and ellipsis, both ``...`` and ``…``),
    bullet-start / ellipsis-end line fractions, alphabetic-word fraction,
    and the required-stopword count. Returns every metric plus the
    per-rule booleans and the overall ``passes`` flag, so downstream can
    either gate on ``passes`` or re-threshold the metrics without
    another scan.

    Every default threshold is the PUBLISHED Rae et al. 2021 Appendix A
    (A1.1, MassiveWeb quality filtering) value, verbatim:

    - ``min_words=50`` / ``max_words=100_000`` — "contain between 50 and
      100,000 words".
    - ``min_mean_word_len=3.0`` / ``max_mean_word_len=10.0`` — "mean word
      length between 3 and 10 characters".
    - ``max_symbol_word_ratio=0.1`` — "symbol-to-word ratio greater than
      0.1 for either the hash symbol or the ellipsis". Deviation note:
      the paper applies 0.1 PER symbol class; this implementation tests
      the SUM of hash+ellipsis counts against 0.1, a strictly more
      aggressive single-ratio form (documents failing the paper's rule
      always fail here). Pass per-class thresholds by re-deriving from
      the returned metric columns if exact per-class gating is needed.
    - ``max_bullet_line_frac=0.9`` — "more than 90% of lines starting
      with a bullet point".
    - ``max_ellipsis_line_frac=0.3`` — "more than 30% ending with an
      ellipsis".
    - ``min_alpha_word_frac=0.8`` — "80% of words in a document contain
      at least one alphabetic character".
    - ``min_stopword_hits=2`` with :data:`GOPHER_REQUIRED_STOPWORDS` —
      the paper's '"stop word" filter': at least 2 of {the, be, to, of,
      and, that, have, with}.

    Scale: pure codegen string expressions — no shuffle, no UDF; at 100 TB
    this is a map-only pass that pushes only (id, text) through the scan.
    Null text is the empty document (module convention, see
    ``_tokens_or_empty``): zero metrics, ``passes`` false — a definite
    verdict, not a NULL one.
    """
    # One parsed selectExpr per projection (r12): the Column-API form of
    # these six lambda HOFs + the literal stopword array cost ~0.3 s of
    # py4j chatter per plan build (guide §7.3); the SQL text parses to
    # the identical expression trees (values pinned bit-for-bit by the
    # text_gopher_filter / curation DuckDB oracles).
    from funnel_rocket_spark.operators._litexpr import _sql_double, _sql_str
    from funnel_rocket_spark.operators.dedup import _tokens_sql

    t = f"coalesce(`{text_col}`, '')"
    words = f"filter(split({t}, '\\\\s+'), t -> t != '')"
    n_words = f"size({words})"
    gw = f"greatest({n_words}, 1)"
    nonspace = f"length(regexp_replace({t}, '\\\\s', ''))"
    n_hash = f"(length({t}) - length(regexp_replace({t}, '#', '')))"
    # both ellipsis spellings count, matching the line-end rule below
    n_ellipsis = (f"((length({t}) - length(replace({t}, '...', ''))) / 3"
                  f" + (length({t}) - length(replace({t}, '…', ''))))")
    lines = f"filter(split({t}, '\\\\n'), ln -> trim(ln) != '')"
    gl = f"greatest(size({lines}), 1)"
    bullet = (f"size(filter({lines}, ln -> "
              "substring(ltrim(ln), 1, 1) IN ('•', '-', '*')))")
    ellipsis_end = (f"size(filter({lines}, ln -> "
                    "endswith(rtrim(ln), '...') OR endswith(rtrim(ln), '…')))")
    alpha = f"size(filter({words}, w -> w rlike '[A-Za-z]'))"
    stops = ("array(" + ",".join(
        _sql_str(w) for w in GOPHER_REQUIRED_STOPWORDS) + ")")
    out = df.selectExpr(
        f"`{id_col}`",
        f"{n_words} AS n_words",
        f"round({nonspace} / {gw}, 6) AS mean_word_len",
        f"round(({n_hash} + {n_ellipsis}) / {gw}, 6) AS symbol_word_ratio",
        f"round({bullet} / {gl}, 6) AS bullet_line_frac",
        f"round({ellipsis_end} / {gl}, 6) AS ellipsis_line_frac",
        f"round({alpha} / {gw}, 6) AS alpha_word_frac",
        f"size(array_intersect({_tokens_sql(t)}, {stops})) AS stopword_hits",
    )
    def _num(v):  # int thresholds as int literals, anything else double
        return str(v) if isinstance(v, int) else _sql_double(v)

    rules = {
        "rule_word_count": (f"n_words >= {_num(min_words)} "
                            f"AND n_words <= {_num(max_words)}"),
        "rule_mean_word_len":
            (f"mean_word_len >= {_sql_double(min_mean_word_len)} "
             f"AND mean_word_len <= {_sql_double(max_mean_word_len)}"),
        "rule_symbol_ratio":
            f"symbol_word_ratio <= {_sql_double(max_symbol_word_ratio)}",
        "rule_bullet_lines":
            f"bullet_line_frac <= {_sql_double(max_bullet_line_frac)}",
        "rule_ellipsis_lines":
            f"ellipsis_line_frac <= {_sql_double(max_ellipsis_line_frac)}",
        "rule_alpha_words":
            f"alpha_word_frac >= {_sql_double(min_alpha_word_frac)}",
        "rule_stopwords": f"stopword_hits >= {_num(min_stopword_hits)}",
    }
    out = out.selectExpr("*", *[f"({e}) AS {n}" for n, e in rules.items()])
    return out.selectExpr(
        "*", "(" + " AND ".join(rules) + ") AS passes")


def c4_line_filter(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_words_per_line: int = 3,
                   require_terminal_punct: bool = True,
                   blacklist: tuple = ("javascript", "lorem ipsum",
                                       "cookie"),
                   out_col: str = "clean_text") -> DataFrame:
    """C4-style LINE-level cleaning (Raffel et al. 2020 §2.2): keep lines
    with ≥ ``min_words_per_line`` words, (optionally) ending in terminal
    punctuation (``. ! ? "``), and containing no blacklist phrase; drop
    the rest and re-join survivors. Returns (id, clean_text, n_lines,
    n_kept) — the kept/total pair is the audit trail C4 reports corpus-wide.

    All work happens inside array HOFs over ``split(text, '\\n')`` — a
    shuffle-free projection like :func:`gopher_quality_filter`, so the two
    compose into a single map-only cleaning stage at any scale. Null text
    is the empty document: empty clean_text, zero counts.
    """
    col = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(col, r"\n"),
                     lambda ln: F.trim(ln) != F.lit(""))

    def keep(ln):
        tl = F.trim(ln)
        n = F.size(F.filter(F.split(tl, r"\s+"),
                            lambda t: t != F.lit("")))
        cond = n >= F.lit(min_words_per_line)
        if require_terminal_punct:
            last = F.substring(tl, F.length(tl), 1)
            cond = cond & last.isin(".", "!", "?", '"')
        low = F.lower(tl)
        for phrase in blacklist:
            cond = cond & ~low.contains(phrase)
        return cond

    kept = F.filter(lines, keep)
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias(out_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
    )


def train_classifier_perceptron(df: DataFrame, label_col, vocab: list,
                                text_col: str = "text",
                                id_col: str = "doc_id",
                                iterations: int = 3,
                                lr: float = 0.5):
    """IN-ENGINE classifier training: deterministic batch perceptron over
    binary bag-of-words features — the trained-weights PRODUCER for
    :func:`classifier_score_weights` (which until now required weights
    trained elsewhere). ``label_col`` is a 0/1 Column expression evaluated
    in-plan; features are presence of each ``vocab`` token plus a constant
    ``__bias__`` feature.

    Why perceptron and not logistic GD: with ``lr`` a dyadic rational
    (default 0.5) every weight stays an exactly-representable binary
    float, so margins, predictions, and the full training trajectory are
    bit-reproducible across engines — an ANSI-SQL oracle can replay
    training exactly (chained CTEs, one per iteration), something a
    sigmoid's ``exp()`` cannot guarantee. Swap in offline logreg/fasttext
    weights via classifier_score_weights when you need calibrated
    probabilities; use this when you need a self-contained, auditable
    in-pipeline gate.

    Plan shape per iteration (the same contract as ``kmeans_lloyd``): one
    corpus scan computes per-doc margins via a broadcast literal weight
    map (zero shuffle), mistakes explode to (token, ydiff) and reduce
    map-side into ≤ ``len(vocab)+1`` rows, which are collected to update
    the model — the only driver state is the model itself. Scales to any
    corpus size; vocab is bounded by the literal-map cap.

    Returns ``(weights, mistakes_per_iter)`` where ``weights`` maps vocab
    tokens (plus ``"__bias__"``) to floats.
    """
    if len(vocab) > _CLASSIFIER_MAP_MAX:
        raise ValueError(
            f"vocab larger than literal-map cap ({_CLASSIFIER_MAP_MAX}); "
            "train on a capped vocabulary (see vocabulary(min_count=...))")
    vocab = sorted(set(vocab))
    vocab_arr = lit_str_array(vocab)
    tk = F.coalesce(tokens(F.col(text_col)), F.array().cast("array<string>"))
    feats = F.concat(F.array(F.lit("__bias__")),
                     F.array_intersect(tk, vocab_arr))
    base = df.select(
        feats.alias("__ft"),
        F.when(label_col.cast("int") == 1, 1).otherwise(0).alias("__y"))
    # every iteration's job re-reads this frame: persist or each of the
    # ``iterations`` jobs re-tokenizes + re-intersects the whole corpus
    # (the kmeans_lloyd contract; ~1 row/doc of (tokens∩vocab, label))
    from funnel_rocket_spark.operators.dedup import bounded_persist
    base = bounded_persist(base)
    weights = {t: 0.0 for t in vocab}
    weights["__bias__"] = 0.0
    mistakes = []
    for _ in range(iterations):
        wmap = lit_double_map(sorted(weights.items()))
        staged = base.withColumn("__wmap", wmap)
        margin = F.aggregate(
            F.col("__ft"), F.lit(0.0),
            lambda acc, t: acc + F.coalesce(
                F.element_at(F.col("__wmap"), t), F.lit(0.0)))
        yhat = F.when(margin > 0, 1).otherwise(0)
        mist = (staged.withColumn("__yhat", yhat)
                .where(F.col("__y") != F.col("__yhat")))
        grad = (mist.select(F.explode("__ft").alias("token"),
                            (F.col("__y") - F.col("__yhat")).alias("__d"))
                .groupBy("token")
                .agg(F.sum("__d").alias("g"), F.count(F.lit(1)).alias("n"))
                .collect())  # bounded: ≤ len(vocab)+1 rows
        n_mist = 0
        for row in grad:
            if row["token"] in weights:
                weights[row["token"]] += lr * row["g"]
            if row["token"] == "__bias__":
                n_mist = row["n"]
        mistakes.append(int(n_mist))
        if n_mist == 0:
            break
    return weights, mistakes


# ---------------------------------------------------------------------------
# Exact pluggable BPE tokenization (merge-table byte-pair encoding)
# ---------------------------------------------------------------------------
# bpe_token_estimate above is a regex HEURISTIC; these operators apply a real
# merge table with exact, engine-portable semantics, so token budgets in
# mixture_plan / pack_token_blocks can be TRUE tokenizer counts. The spec is
# the original subword-nmt formulation (Sennrich, Haddow & Birch 2016,
# "Neural Machine Translation of Rare Words with Subword Units"): per
# whitespace word, start from the character sequence and apply each merge
# (a, b) -> ab in TABLE ORDER as a left-to-right non-overlapping literal
# replacement over the space-delimited symbol string. Sequential-replace
# semantics are exactly replayable by any engine with a literal replace()
# (the DuckDB oracle nests one replace per merge), unlike HuggingFace's
# lowest-rank-pair-first scan whose tie behavior is implementation-defined.

_BPE_EXPR_MERGE_CAP = 4_096  # literal merge-array entries before Arrow path


def _bpe_word_expr(word, merges_arr):
    """Symbol string for one word after all merges: char-split via
    regexp_replace('(.)' -> '$1 ') then fold the merge array with
    aggregate() — the whole encode is one codegen expression, no UDF."""
    # (?s): Java '.' skips / / , which survive the ASCII
    # \s+ word split — dotall makes the char-split total (RE2 oracles use
    # the same inline flag)
    sym = F.trim(F.regexp_replace(word, "(?s)(.)", "$1 "))
    return F.aggregate(
        merges_arr, sym,
        lambda acc, m: F.replace(acc, m["pat"], m["rep"]))


def _check_merges(merges: list) -> list:
    out = []
    for pair in merges:
        a, b = pair
        if not a or not b or " " in a or " " in b:
            raise ValueError(f"invalid merge pair {pair!r}: symbols must be "
                             "non-empty and space-free")
        out.append((a, b))
    # an EMPTY table is legal: it is BPE's base case (character-level
    # tokenization) and what learn_bpe returns on a corpus with no pair
    # reaching min_count — e.g. a curate chain whose cleaning stages
    # emptied the corpus before bpe_count trains
    return out


def bpe_tokenize(df: DataFrame, merges: list, text_col: str = "text",
                 id_col: str = "doc_id", lowercase: bool = False,
                 strategy: str = "auto") -> DataFrame:
    """EXACT merge-table BPE over every document: returns
    ``(id, n_bpe_tokens, bpe_text)`` where ``bpe_text`` is the encoded
    token stream joined with single spaces (scalar string — the driver's
    canonicalizer can sort/hash it; split on ' ' to recover the tokens).

    ``merges`` is the ordered merge table ``[(left, right), ...]`` —
    supply a published tokenizer's merges.txt rows or the output of
    :func:`learn_bpe`. Unknown characters pass through as single-char
    tokens (count 1 each), so the count is total and never null. An
    EMPTY table is the BPE base case — pure character-level
    tokenization — so :func:`learn_bpe`'s no-qualifying-pairs result
    composes without a special case.

    Strategies (``auto`` picks by table size):

    - ``expr`` (≤ ``_BPE_EXPR_MERGE_CAP`` merges): the merge table is a
      literal array of (pat, rep) structs folded with ``aggregate()``
      inside ``transform()`` over the word array — pure whole-stage
      codegen, zero shuffle, zero Python. The 100 TB path for the small
      tables in-engine training produces.
    - ``arrow`` (any size, e.g. GPT-2's 50k merges): ``mapInPandas``
      with the table broadcast in the task closure and a per-batch
      word→encoding memo (Zipf makes the memo hit rate high). Same
      semantics bit-for-bit — equality is pinned by a test.

    Scale: both paths are map-only projections; cost is linear in corpus
    size with no exchange at any corpus size.
    """
    merges = _check_merges(merges)
    if strategy == "auto":
        strategy = "expr" if len(merges) <= _BPE_EXPR_MERGE_CAP else "arrow"
    col = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    if lowercase:
        col = F.lower(col)
    if strategy == "expr":
        if len(merges) > _BPE_EXPR_MERGE_CAP:
            raise ValueError(
                f"{len(merges)} merges exceeds the literal-expression cap "
                f"({_BPE_EXPR_MERGE_CAP}); use strategy='arrow'")
        words = F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))
        if merges:
            merges_arr = F.array(*[
                F.struct(F.lit(f"{a} {b}").alias("pat"),
                         F.lit(f"{a}{b}").alias("rep")) for a, b in merges])
            staged = df.withColumn("__bpe_merges", merges_arr)
            enc = F.transform(
                words,
                lambda w: F.split(_bpe_word_expr(w, F.col("__bpe_merges")),
                                  " "))
        else:  # base case: character-level tokens, no fold needed
            staged = df
            enc = F.transform(
                words,
                lambda w: F.split(
                    F.trim(F.regexp_replace(w, "(?s)(.)", "$1 ")), " "))
        toks = F.flatten(enc)
        return staged.select(
            F.col(id_col),
            F.coalesce(F.size(toks), F.lit(0)).alias("n_bpe_tokens"),
            F.coalesce(F.array_join(toks, " "), F.lit(""))
            .alias("bpe_text"))
    if strategy != "arrow":
        raise ValueError(f"strategy must be auto|expr|arrow: {strategy!r}")

    import re

    import pandas as pd  # noqa: F401 (Arrow batch path)

    # Declare the id column with its ACTUAL Spark type (not an int-dtype
    # allowlist): mapInPandas yields the original dtype, so any mismatch
    # between the declared schema and the real type (double, decimal,
    # date, ...) is a runtime Arrow error.
    id_dtype = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_dtype}, n_bpe_tokens int, bpe_text string"

    # Match the expr path's Java-regex \s+ EXACTLY: Java \s is the ASCII
    # class [ \t\n\x0b\f\r], while Python str.split() splits on Unicode
    # whitespace (U+00A0, U+3000, U+2028, ...) — common in web corpora.
    # strategy='auto' must not switch word-boundary semantics at the
    # merge-count threshold.
    ascii_ws = re.compile(r"[ \t\n\x0b\f\r]+")

    # Vectorized merge prefilter: a merge whose characters aren't all
    # present in the word can never match (its pattern can't be a
    # substring), so its replace() is a no-op and may be skipped without
    # changing the output. Each merge's char set hashes to a 64-bit
    # bitmask; ONE numpy pass per distinct word selects the candidate
    # merges ((mask & ~word_mask) == 0 — hash collisions only ADMIT
    # extra no-op replaces, never drop a real one). This keeps the
    # per-word cost ~O(candidates) instead of O(|merge table|): a pure-
    # Python per-merge subset loop at GPT-2 scale (32k-50k merges) is
    # ~10^11 set ops over a 200k-word vocabulary — hours, not seconds.
    # The word memo then amortizes across occurrences (Zipf: high hit
    # rate per batch).
    import numpy as np

    def _mask(chars) -> int:
        m = 0
        for ch in set(chars):
            # take the TOP 6 bits of the 32-bit Knuth product: masking
            # the low bits of odd-multiplier*x is just x mod 64 (zero
            # mixing — every pair of chars 64 code points apart would
            # share a bit and admit extra no-op replaces)
            m |= 1 << (((ord(ch) * 2654435761) & 0xFFFFFFFF) >> 26)
        return m

    pats = [f"{a} {b}" for a, b in merges]
    reps = [f"{a}{b}" for a, b in merges]
    merge_masks = np.array([_mask(a + b) for a, b in merges],
                           dtype=np.uint64)

    def encode_batches(it):
        memo: dict = {}

        def enc_word(w: str) -> str:
            hit = memo.get(w)
            if hit is None:
                s = " ".join(w)
                wm = np.uint64(_mask(w))
                for i in np.flatnonzero((merge_masks & ~wm) == 0):
                    s = s.replace(pats[i], reps[i])
                memo[w] = hit = s
            return hit

        for pdf in it:
            texts = pdf[text_col].fillna("")
            if lowercase:
                texts = texts.str.lower()
            encoded = [" ".join(enc_word(w) for w in ascii_ws.split(t) if w)
                       for t in texts]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_bpe_tokens": [len(e.split(" ")) if e else 0
                                 for e in encoded],
                "bpe_text": encoded,
            })

    return (df.select(id_col, text_col)
            .mapInPandas(encode_batches, schema=out_schema))


_BPE_DRIVER_MAX_VOCAB = 2_000_000  # distinct words the driver loop holds


def learn_bpe(df: DataFrame, n_merges: int, text_col: str = "text",
              lowercase: bool = False, min_count: int = 2,
              checkpoint_every: int = 8, strategy: str = "auto",
              driver_max_vocab: int = _BPE_DRIVER_MAX_VOCAB) -> list:
    """IN-ENGINE BPE training (the merge-table PRODUCER for
    :func:`bpe_tokenize`): learn ``n_merges`` merges from the corpus by
    the classic greedy criterion — repeatedly merge the most frequent
    adjacent symbol pair, frequencies weighted by word counts (Sennrich
    et al. 2016 Algorithm 1), under the engine's sequential
    STRING-replace merge semantics (the same fold
    :func:`bpe_tokenize`'s expr path and the DuckDB oracles replay).

    ONE corpus pass builds the distinct-word frequency table — the
    exchange is vocabulary-bounded, not corpus-bounded, so a 100 TB
    corpus reduces to its vocabulary before any iteration runs. Then:

    - ``strategy="distributed"``: each iteration computes weighted pair
      counts over that table (pairs via the shared zip-with n-gram
      expression) and collects exactly ONE row — the argmax pair, ties
      broken lexicographically so training is deterministic on any
      layout — and folds the merge into the symbol column. Lineage is
      cut with localCheckpoint every ``checkpoint_every`` iterations.
      One Spark job per merge: right when merges are few or the
      vocabulary itself is too big to collect.
    - ``strategy="driver"``: collect the word-frequency table ONCE
      (guarded by ``driver_max_vocab``) and run the greedy loop
      driver-side with an incremental pair index + lazy-deletion heap —
      one Spark job TOTAL, the only shape that works at realistic
      32k–50k merge counts. Bit-equal to the distributed path (see
      :func:`_learn_bpe_driver` for the boundary-match subtlety).
    - ``strategy="auto"``: driver when the vocabulary fits
      ``driver_max_vocab`` (one cheap count on the word table),
      distributed otherwise.

    Stops early when the best pair's weighted count drops below
    ``min_count``. Returns the ordered merge list.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if strategy not in ("auto", "distributed", "driver"):
        raise ValueError(
            f"strategy must be auto|distributed|driver: {strategy!r}")
    col = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    if lowercase:
        col = F.lower(col)
    words = F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))
    wf = (df.select(F.explode(words).alias("__w"))
          .groupBy("__w").agg(F.count(F.lit(1)).alias("__n"))
          # (?s) matches what Java '.' alone skips (NEL and the unicode
          # line separators, which SURVIVE the ASCII \s+ word split) —
          # without it the trainer would fuse such a char into the next
          # symbol and segment words differently than bpe_tokenize's
          # (?s) char split
          .select(F.trim(F.regexp_replace(F.col("__w"), "(?s)(.)", "$1 "))
                  .alias("__sym"), "__n")
          .localCheckpoint())
    if strategy == "auto":
        # wf is checkpointed, so this count is a cheap local scan
        strategy = ("driver" if wf.count() <= driver_max_vocab
                    else "distributed")
    if strategy == "driver":
        # guard BEFORE collecting: wf is checkpointed so the count is a
        # cheap local scan, and collecting an over-bound vocabulary
        # first would be exactly the driver OOM the bound exists to
        # prevent
        n_vocab = wf.count()
        if n_vocab > driver_max_vocab:
            raise ValueError(
                f"vocabulary {n_vocab} exceeds driver_max_vocab "
                f"{driver_max_vocab}; use strategy='distributed'")
        pdf = wf.toPandas()  # bounded: just counted ≤ driver_max_vocab
        return _learn_bpe_driver(
            list(zip(pdf["__sym"].tolist(), pdf["__n"].tolist())),
            n_merges, min_count)
    merges: list = []
    for i in range(n_merges):
        pairs = _contiguous_ngrams(F.split(F.col("__sym"), " "), 2)
        best = (wf.select(F.explode(pairs).alias("__p"), "__n")
                .groupBy("__p").agg(F.sum("__n").alias("__c"))
                .orderBy(F.col("__c").desc(), F.col("__p").asc())
                .limit(1).collect())  # bounded: exactly one row
        if not best or best[0]["__c"] < min_count:
            break
        pat = best[0]["__p"]
        a, b = pat.split(" ")
        merges.append((a, b))
        wf = wf.withColumn(
            "__sym", F.replace(F.col("__sym"), F.lit(pat), F.lit(a + b)))
        if (i + 1) % checkpoint_every == 0:
            wf = wf.localCheckpoint()
    return merges


def bpe_merges_to_text(merges: list) -> str:
    """Serialize a merge table to the published ``merges.txt`` format
    (GPT-2 / HuggingFace tokenizers: a ``#version`` header, then one
    ``left right`` pair per line in rank order) — so tables trained by
    :func:`learn_bpe` interchange with external tokenizer tooling.
    Symbols produced by this engine never contain ASCII whitespace
    (words come from the Java ``\\s+`` split — the ASCII class), so the
    space-separated line format is lossless; only a symbol that would
    actually break the format (empty, or containing a char of that same
    ASCII class) is rejected. Unicode whitespace like U+00A0 is
    deliberately legal in symbols — it is in-word under the engine's
    tokenization, and str.isspace() would wrongly reject tables the
    engine itself learns from web corpora."""
    bad_chars = set(" \t\n\x0b\f\r")
    for a, b in merges:
        if not a or not b or bad_chars & set(a + b):
            raise ValueError(
                f"merge pair {(a, b)!r} is not merges.txt-serializable "
                "(empty symbol, or symbol containing ASCII whitespace)")
    return "#version: 0.2\n" + "".join(f"{a} {b}\n" for a, b in merges)


def bpe_merges_from_text(txt: str) -> list:
    """Parse ``merges.txt`` content (the :func:`bpe_merges_to_text`
    format, i.e. GPT-2 / HuggingFace exports) into the ordered merge
    list :func:`bpe_tokenize` applies. ``#``-prefixed header lines and
    blank lines are skipped; any other line must be exactly two
    space-separated symbols. Lines split on ``\\n`` only (NOT
    str.splitlines, which would split inside symbols carrying U+2028/
    U+2029/NEL) and edges strip ASCII whitespace only (a Unicode-aware
    strip would truncate e.g. a trailing-NBSP symbol instead of
    round-tripping it)."""
    merges = []
    for ln, line in enumerate(txt.split("\n"), 1):
        s = line.strip(" \t\r")
        if not s or s.startswith("#"):
            continue
        parts = s.split(" ")
        if len(parts) != 2 or not parts[0] or not parts[1]:
            raise ValueError(f"merges.txt line {ln} is not a pair: {s!r}")
        merges.append((parts[0], parts[1]))
    return merges


def _learn_bpe_driver(word_freqs: list, n_merges: int,
                      min_count: int) -> list:
    """Driver-side greedy BPE over a collected (symbol-string, count)
    word table — bit-equal to the distributed loop.

    Semantics being reproduced EXACTLY: pair counts are adjacent
    elements of ``sym.split(' ')`` (overlapping occurrences counted, so
    ``a a a`` holds two ``a a`` pairs); the argmax is (count desc,
    pair-string asc — Python code-point order == Spark's UTF8 binary
    order for the same strings); the winning pattern ``"a b"`` is folded
    with left-to-right non-overlapping STRING replace, which also fires
    across symbol boundaries (symbols ``[xa, b]`` render ``"xa b"``,
    matching pattern ``"a b"`` at offset 1 → ``"xab"``). A word is
    therefore affected by merge (a, b) iff some adjacency (p, q) has
    ``p.endswith(a) and q.startswith(b)`` — the exact-pair index alone
    would miss the boundary matches, so adjacencies are ALSO bucketed by
    ``(p[-1], q[0])``: a merge scans one small bucket for matching
    adjacency keys instead of the whole vocabulary.

    Cost per merge: one bucket scan + re-hash of only the affected
    words; stale heap entries are lazily discarded (an entry is valid
    only while its count matches the live counter). 50k merges over a
    few million words run in seconds-to-minutes, vs 50k Spark jobs.
    """
    import heapq
    from collections import Counter, defaultdict

    words: list = []   # current symbol-string per distinct word
    freqs: list = []   # corpus frequency per distinct word
    pc: Counter = Counter()             # pair -> weighted count
    occ: dict = defaultdict(set)        # pair -> word indexes holding it
    buckets: dict = defaultdict(set)    # (p[-1], q[0]) -> pairs (p, q)

    def add_word(wi: int) -> None:
        syms = words[wi].split(" ")
        n = freqs[wi]
        for p, q in zip(syms, syms[1:]):
            pair = (p, q)
            pc[pair] += n
            occ[pair].add(wi)
            buckets[(p[-1], q[0])].add(pair)

    def drop_word(wi: int) -> None:
        syms = words[wi].split(" ")
        n = freqs[wi]
        for p, q in zip(syms, syms[1:]):
            pair = (p, q)
            pc[pair] -= n
            occ[pair].discard(wi)
            if not occ[pair]:
                del pc[pair], occ[pair]
                buckets[(p[-1], q[0])].discard(pair)

    for sym, n in word_freqs:
        if not sym:
            continue
        words.append(sym)
        freqs.append(int(n))
        add_word(len(words) - 1)

    heap = [(-c, f"{p} {q}", (p, q)) for (p, q), c in pc.items()]
    heapq.heapify(heap)
    merges: list = []
    while len(merges) < n_merges:
        top = None
        while heap:
            negc, _ps, pair = heap[0]
            if pc.get(pair) == -negc:  # live entry
                top = heap[0]
                break
            heapq.heappop(heap)  # stale: count changed since push
        if top is None or -top[0] < min_count:
            break
        a, b = top[2]
        merges.append((a, b))
        pat, rep = f"{a} {b}", a + b
        # Every word whose STRING contains pat: adjacency (p, q) with
        # p.endswith(a), q.startswith(b) — all such pairs live in the
        # (a[-1], b[0]) bucket.
        affected: set = set()
        for p, q in list(buckets.get((a[-1], b[0]), ())):
            if p.endswith(a) and q.startswith(b):
                affected |= occ[p, q]
        touched: set = set()
        for wi in affected:
            # EVERY pair in the old and new adjacency lists changed
            # count — including pairs merely decremented that survive in
            # other words; without a refreshed entry their stale (higher)
            # heap entries would be lazily discarded and the pair lost.
            syms = words[wi].split(" ")
            touched.update(zip(syms, syms[1:]))
            drop_word(wi)
            words[wi] = words[wi].replace(pat, rep)
            add_word(wi)
            syms = words[wi].split(" ")
            touched.update(zip(syms, syms[1:]))
        for pair in touched:  # push refreshed counts (lazy deletion)
            if pair in pc:
                heapq.heappush(
                    heap, (-pc[pair], f"{pair[0]} {pair[1]}", pair))
    return merges


def perceptron_predict(df: DataFrame, weights: dict,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Apply a :func:`train_classifier_perceptron` model with the EXACT
    training-time feature map — binary presence of each vocab token plus
    the ``__bias__`` feature, margin = sum of matched weights, decision
    ``margin > 0`` — so on a corpus the training converged on (zero
    mistakes) the predictions reproduce the labels exactly.
    (:func:`classifier_score_weights` is the OCCURRENCE-weighted,
    length-normalized scorer for calibrated external weights; it ignores
    ``__bias__`` and counts repeats, so it is NOT the perceptron's
    decision function.)

    Zero shuffle: the model folds into a broadcast literal map, the
    margin is one aggregate() over the distinct-token intersection.
    Returns (id, margin, label_pred).
    """
    if len(weights) > _CLASSIFIER_MAP_MAX + 1:
        raise ValueError(
            f"weights larger than literal-map cap ({_CLASSIFIER_MAP_MAX})")
    vocab = sorted(t for t in weights if t != "__bias__")
    vocab_arr = lit_str_array(vocab)
    tk = F.coalesce(tokens(F.col(text_col)), F.array().cast("array<string>"))
    feats = F.array_intersect(tk, vocab_arr)
    wmap = lit_double_map((t, float(weights[t])) for t in vocab)
    staged = df.withColumn("__wmap", wmap)
    margin = F.aggregate(
        feats, F.lit(float(weights.get("__bias__", 0.0))),
        lambda acc, t: acc + F.coalesce(
            F.element_at(F.col("__wmap"), t), F.lit(0.0)))
    return staged.select(
        F.col(id_col),
        margin.alias("margin"),
        F.when(margin > 0, 1).otherwise(0).alias("label_pred"))


# ---------------------------------------------------------------------------
# CCNet-style LM quality scoring (hashed bigram LM with stupid backoff)
# ---------------------------------------------------------------------------
# Wenzek et al. 2020 ("CCNet: Extracting High Quality Monolingual Datasets
# from Web Crawl Data") rank web documents by the perplexity of a language
# model trained on a high-quality target corpus (Wikipedia) — the quality
# signal LLaMA-style pipelines filter on. These operators reproduce that
# signal in-engine: train a hashed-bucket bigram LM on the target corpus
# (bounded aggregates, the DSIR discipline), score every raw document as a
# zero-shuffle literal-map projection. Log-probs are quantized to dyadic
# rationals (multiples of 2^-20) so per-doc sums are exact and
# order-independent — a SQL oracle replays training AND scoring bit-for-bit.

_LM_ALPHA = 0.4  # stupid-backoff discount (Brants et al. 2007)


_LM_BUCKET_CAP = 1 << 20      # unigram collect bound (rows)
_LM_BIGRAM_CAP = 500_000      # bigram collect bound (rows)
_LM_FRAMES_BUCKET_CAP = 1 << 30  # frames trainer: key p*nb+c fits a long
# rows (uni+bi) under which the frames scorer broadcasts the model; above,
# the join is left to Catalyst/AQE (shuffled hash on the exploded pairs)
_LM_FRAMES_BROADCAST_MAX = 4_000_000
_LM_MAP_BUCKET_CAP = 1024     # literal-map scoring path caps: beyond
_LM_MAP_BIGRAM_CAP = _CLASSIFIER_MAP_MAX  # these, lm_score auto-joins


def lm_bigram_model(df_target: DataFrame, text_col: str = "text",
                    n_buckets: int = 256, smoothing: float = 1.0,
                    top_bigrams: int = 1024) -> dict:
    """Train the hashed bigram LM on the target corpus. Driver traffic is
    bounded by construction: the unigram aggregate reduces to
    ≤ ``n_buckets`` rows and the bigram table keeps only the
    ``top_bigrams`` most frequent pairs (count desc, then key asc — the
    deterministic tie-break every trainer in this repo uses), the same
    pruning a deployed KenLM model ships with. Returns
    ``{"uni": {bucket: logp}, "bi": {p*n_buckets+c: logp}, "log_alpha", ...}``
    with every log-prob quantized to a multiple of 2^-20.

    CCNet-grade capacity (~10⁵+ n-grams) is in bounds: a model bigger
    than the literal-map caps (1024 buckets / 2000 bigrams) is scored by
    :func:`lm_score`'s broadcast-join path automatically.
    """
    import math

    from funnel_rocket_spark.operators.sampling import _md5_bucket

    if n_buckets < 2 or n_buckets > _LM_BUCKET_CAP:
        raise ValueError(
            f"n_buckets must be in [2, {_LM_BUCKET_CAP}] (driver collect)")
    if top_bigrams < 0 or top_bigrams > _LM_BIGRAM_CAP:
        raise ValueError(
            f"top_bigrams must be in [0, {_LM_BIGRAM_CAP}]")
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0")
    q = float(1 << 20)

    def qln(x: float) -> float:
        return round(math.log(x) * q) / q

    tk = F.coalesce(tokens(F.col(text_col)), F.array().cast("array<string>"))
    bs = F.transform(tk, lambda t: _md5_bucket(t, n_buckets).cast("int"))
    staged = df_target.select(bs.alias("__bs"))
    n = F.size("__bs")
    # integer pair key p*n_buckets + c: int-keyed maps hash cheaper than
    # string concat keys in the scoring hot loop, and the numeric
    # tie-break replays trivially in SQL
    pair_keys = F.zip_with(
        F.slice("__bs", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("__bs", 2, F.greatest(n - 1, F.lit(0))),
        # long arithmetic: int32 overflows at n_buckets > ~46k (ANSI)
        lambda p, c: p.cast("long") * n_buckets + c)
    # ONE collect job for both model tables: the unigram aggregate
    # (≤ n_buckets rows) and the top-bigram aggregate (≤ top_bigrams
    # rows after its sort+limit) are branches of a union, so their
    # stages run concurrently instead of as two sequential driver
    # round-trips. Driver traffic keeps the same per-branch bounds.
    uni_branch = (staged.select(F.explode("__bs").alias("k"))
                  .groupBy(F.col("k").cast("long").alias("k"))
                  .agg(F.count(F.lit(1)).alias("c"))
                  .select(F.lit(0).alias("t"), "k", "c"))
    bi_branch = (staged.select(F.explode(pair_keys).alias("k"))
                 .groupBy("k").agg(F.count(F.lit(1)).alias("c"))
                 .orderBy(F.col("c").desc(), F.col("k").asc())
                 .limit(top_bigrams)
                 .select(F.lit(1).alias("t"), "k", "c"))
    rows = uni_branch.unionByName(bi_branch).collect()
    uc = {int(r["k"]): int(r["c"]) for r in rows if r["t"] == 0}
    total = sum(uc.values())
    s = float(smoothing)
    uni = {b: qln((uc.get(b, 0) + s) / (total + s * n_buckets))
           for b in range(n_buckets)}
    top = [r for r in rows if r["t"] == 1]
    bi = {}
    for r in top:
        p = int(r["k"]) // n_buckets
        bi[int(r["k"])] = qln((int(r["c"]) + s)
                              / (uc.get(p, 0) + s * n_buckets))
    return {"uni": uni, "bi": bi, "log_alpha": qln(_LM_ALPHA),
            "n_buckets": n_buckets, "smoothing": s,
            "top_bigrams": top_bigrams}


def lm_bigram_model_frames(df_target: DataFrame, text_col: str = "text",
                           n_buckets: int = 256, smoothing: float = 1.0,
                           top_bigrams: int = 1024,
                           checkpoint: bool = True) -> dict:
    """FRAMES-NATIVE LM training: the same hashed-bigram stupid-backoff
    model as :func:`lm_bigram_model`, but the unigram and bigram tables
    are built and kept as DataFrames — the model NEVER passes through
    the driver, so ``n_buckets`` / ``top_bigrams`` are not collect-bound
    (a CCNet-grade 10⁶-bucket / 10⁷-bigram model stays on the cluster
    end to end). Returns ``{"uni_df", "bi_df", "log_alpha", ...,
    "frames": True}``; feed it to :func:`lm_score`, which joins the
    model frames against the corpus.

    Value-identical to the dict trainer on the same corpus and params
    (test-pinned): both quantize every log-prob to a multiple of 2^-20
    — ``round(ln(x) * 2^20) / 2^20`` — which absorbs any sub-ulp ln()
    difference between the JVM and CPython and keeps the DuckDB oracle
    bit-exact. ``checkpoint=True`` (default) localCheckpoints both model
    frames so the two training aggregates run once, not once per
    scoring consumer (the unigram table has two: backoff + first-token).
    """
    import math

    from funnel_rocket_spark.operators.sampling import _md5_bucket

    if n_buckets < 2 or n_buckets > _LM_FRAMES_BUCKET_CAP:
        raise ValueError(
            f"n_buckets must be in [2, {_LM_FRAMES_BUCKET_CAP}] "
            "(pair key p*n_buckets+c must fit a long)")
    if top_bigrams < 0:
        raise ValueError("top_bigrams must be >= 0")
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0")
    spark = df_target.sparkSession
    s = float(smoothing)
    q = 1048576.0  # 2^20 — same dyadic grid as the dict trainer/oracle

    def qln(x):  # column-side twin of the dict trainer's round(log(x)*q)
        # F.rint (Math.rint) rounds half-to-even like Python round();
        # F.round would round half-UP and could differ from the dict
        # trainer at exact rounding ties
        return F.rint(F.log(x) * q) / q

    tk = F.coalesce(tokens(F.col(text_col)), F.array().cast("array<string>"))
    bs = F.transform(tk, lambda t: _md5_bucket(t, n_buckets).cast("int"))
    staged = df_target.select(bs.alias("__bs"))
    uni_counts = (staged.select(F.explode("__bs").alias("__b"))
                  .groupBy("__b").agg(F.count(F.lit(1)).alias("__c")))
    # one-row total frame: sum over observed buckets (0 on empty corpus)
    tot = uni_counts.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).alias("__t"))
    all_b = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("__b"))
    uni_df = (all_b.join(uni_counts, "__b", "left")
              .crossJoin(F.broadcast(tot))
              .select("__b", qln(
                  (F.coalesce(F.col("__c"), F.lit(0)) + F.lit(s))
                  / (F.col("__t") + F.lit(s * n_buckets))).alias("__uv")))

    n = F.size("__bs")
    pair_keys = F.zip_with(
        F.slice("__bs", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("__bs", 2, F.greatest(n - 1, F.lit(0))),
        lambda p, c: p.cast("long") * n_buckets + c)
    topb = (staged.select(F.explode(pair_keys).alias("__pc"))
            .groupBy("__pc").agg(F.count(F.lit(1)).alias("__c"))
            .orderBy(F.col("__c").desc(), F.col("__pc").asc())
            .limit(top_bigrams))
    prefix_uc = uni_counts.select(F.col("__b").alias("__p"),
                                  F.col("__c").alias("__pu"))
    bi_df = (topb.withColumn(
                 "__p", F.floor(F.col("__pc") / n_buckets).cast("int"))
             .join(prefix_uc, "__p", "left")
             .select("__pc", qln(
                 (F.col("__c") + F.lit(s))
                 / (F.coalesce(F.col("__pu"), F.lit(0))
                    + F.lit(s * n_buckets))).alias("__bv")))
    n_bigrams = None
    if checkpoint:
        # ONE eager action for both model tables: the two aggregates are
        # branches of a tagged union checkpointed together (their stages
        # run concurrently instead of as two sequential driver round
        # trips), and the derived views are local filters over the
        # checkpointed blocks. (__b is int, __pc long — the union rides
        # the wider key and the uni view casts back.)
        both = (uni_df.select(F.lit(0).alias("__t"),
                              F.col("__b").cast("long").alias("__k"),
                              F.col("__uv").alias("__v"))
                .unionByName(bi_df.select(F.lit(1).alias("__t"),
                                          F.col("__pc").alias("__k"),
                                          F.col("__bv").alias("__v")))
                .localCheckpoint())
        uni_df = (both.where(F.col("__t") == 0)
                  .select(F.col("__k").cast("int").alias("__b"),
                          F.col("__v").alias("__uv")))
        bi_df = (both.where(F.col("__t") == 1)
                 .select(F.col("__k").alias("__pc"),
                         F.col("__v").alias("__bv")))
        # checkpointed => counting is a cheap local scan; the ACTUAL
        # row count (not the requested cap) drives the scorer's
        # broadcast-vs-AQE decision, so a small model trained with a
        # generous top_bigrams cap keeps its broadcast plan
        n_bigrams = bi_df.count()
    return {"uni_df": uni_df, "bi_df": bi_df,
            "log_alpha": round(math.log(_LM_ALPHA) * q) / q,
            "n_buckets": n_buckets, "smoothing": s,
            "top_bigrams": top_bigrams, "n_bigrams": n_bigrams,
            "frames": True}


def lm_score(df_raw: DataFrame, model: dict, text_col: str = "text",
             id_col: str = "doc_id", strategy: str = "auto") -> DataFrame:
    """Score every raw document under the trained LM: per-doc log
    probability (unigram for the first token, bigram with stupid backoff
    — ``log_alpha + unigram`` for unseen pairs — for the rest) and the
    average negative log-likelihood ``avg_nll`` (= ln(perplexity); CCNet
    thresholds perplexity, which is monotone in this, and avoiding the
    exp() keeps values dyadic-exact for the oracle). Null/empty text
    scores 0 over 0 tokens.

    Two plan shapes (the :func:`classifier_score_weights` map-vs-join
    split):

    - ``"map"``: the model folds into two broadcast literal maps, so
      scoring is ONE zero-shuffle codegen projection over the corpus
      scan — the cost at 100 TB is exactly one pass. Capped at 1024
      buckets / 2000 bigrams (codegen literal limits).
    - ``"join"``: the model becomes two Arrow-built DataFrames
      (bucket→logp, pairkey→logp) broadcast-joined against the exploded
      per-position pair keys, then re-aggregated per doc. One corpus
      pass + one partial-aggregated exchange whose shuffle volume is
      ~1 row/doc (map-side combine collapses positions before the
      shuffle) — the shape that carries a CCNet-grade 10⁵⁺-entry model.
    - ``"auto"``: map when the model fits the literal caps, else join.
    """
    if strategy not in ("auto", "map", "join"):
        raise ValueError(f"strategy must be auto|map|join: {strategy!r}")
    if model.get("frames"):
        # frames-native model (lm_bigram_model_frames): the uni/bi tables
        # are DataFrames — join scoring is the only shape; 'map' would
        # mean collecting the model, defeating the point
        if strategy == "map":
            raise ValueError(
                "a frames-native model cannot use strategy='map' "
                "(the model tables are DataFrames; use 'join'/'auto')")
        n_bi = model.get("n_bigrams")
        if n_bi is None:
            # checkpoint=False model: sizing the broadcast decision on the
            # REQUESTED top_bigrams cap would silently drop the broadcast
            # plan for a small model trained with a generous cap (e.g.
            # 10M) — a perf cliff. Bound the count at the decision
            # threshold: anything past it joins the same way regardless.
            # Cache the answer back into the model dict: bi_df's lineage
            # embeds the full training aggregation for checkpoint=False
            # models, and limit() cannot short-circuit an aggregate, so
            # re-counting per scoring call would re-pay training each time.
            n_bi = (model["bi_df"]
                    .limit(_LM_FRAMES_BROADCAST_MAX + 1).count())
            model["n_bigrams"] = n_bi
        n_rows = model["n_buckets"] + n_bi
        return _lm_score_with_frames(
            df_raw, model["uni_df"], model["bi_df"],
            float(model["log_alpha"]), model["n_buckets"],
            text_col, id_col,
            broadcast_model=n_rows <= _LM_FRAMES_BROADCAST_MAX)
    if strategy == "auto":
        strategy = ("map" if model["n_buckets"] <= _LM_MAP_BUCKET_CAP
                    and len(model["bi"]) <= _LM_MAP_BIGRAM_CAP else "join")
    if strategy == "join":
        return _lm_score_join(df_raw, model, text_col, id_col)
    if (model["n_buckets"] > _LM_MAP_BUCKET_CAP
            or len(model["bi"]) > _LM_MAP_BIGRAM_CAP):
        raise ValueError(
            f"model exceeds literal-map caps ({_LM_MAP_BUCKET_CAP} "
            f"buckets / {_LM_MAP_BIGRAM_CAP} bigrams); use "
            "strategy='join'")
    from funnel_rocket_spark.operators.sampling import _md5_bucket

    n_buckets = model["n_buckets"]
    uni_map = lit_double_map((b, model["uni"][b])
                             for b in sorted(model["uni"]))
    tk = F.coalesce(tokens(F.col(text_col)), F.array().cast("array<string>"))
    bs = F.transform(tk, lambda t: _md5_bucket(t, n_buckets).cast("int"))
    staged = (df_raw.withColumn("__bs", bs)
              .withColumn("__uni", uni_map))
    if model["bi"]:
        bi_map = lit_double_map((k, model["bi"][k])
                                for k in sorted(model["bi"]))
        staged = staged.withColumn("__bi", bi_map)
        bi_of = lambda key: F.element_at(F.col("__bi"), key)  # noqa: E731
    else:
        bi_of = lambda key: F.lit(None).cast("double")  # noqa: E731
    n = F.size("__bs")
    alpha = F.lit(float(model["log_alpha"]))
    pair_lp = F.zip_with(
        F.slice("__bs", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("__bs", 2, F.greatest(n - 1, F.lit(0))),
        lambda p, c: F.coalesce(
            bi_of(p * n_buckets + c),
            alpha + F.element_at(F.col("__uni"), c)))
    first = F.when(n > 0, F.element_at(F.col("__uni"),
                                       F.element_at("__bs", 1))) \
        .otherwise(F.lit(0.0))
    lp = first + F.aggregate(pair_lp, F.lit(0.0), lambda acc, x: acc + x)
    return staged.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(lp, 6).alias("logprob_sum"),
        F.round(-lp / F.greatest(n, F.lit(1)), 6).alias("avg_nll"))


def _lm_score_join(df_raw: DataFrame, model: dict, text_col: str,
                   id_col: str) -> DataFrame:
    """Broadcast-join scorer for models beyond the literal-map caps.

    The model ships as two small DataFrames built Arrow-side from the
    trained dicts (≤ n_buckets + |bi| rows — no Python-RDD literals),
    explicitly broadcast; the scoring plan itself is shared with the
    frames-native path (:func:`_lm_score_with_frames`)."""
    import pandas as pd

    spark = df_raw.sparkSession
    n_buckets = model["n_buckets"]
    uni_pdf = pd.DataFrame(
        {"__b": list(model["uni"].keys()),
         "__uv": [float(v) for v in model["uni"].values()]})
    uni_df = spark.createDataFrame(uni_pdf,
                                   schema="__b int, __uv double")
    if model["bi"]:
        bi_pdf = pd.DataFrame(
            {"__pc": list(model["bi"].keys()),
             "__bv": [float(v) for v in model["bi"].values()]})
        bi_df = spark.createDataFrame(bi_pdf,
                                      schema="__pc long, __bv double")
    else:
        bi_df = spark.range(0).select(
            F.col("id").cast("long").alias("__pc"),
            F.lit(0.0).alias("__bv"))
    return _lm_score_with_frames(df_raw, uni_df, bi_df,
                                 float(model["log_alpha"]), n_buckets,
                                 text_col, id_col, broadcast_model=True)


def _lm_score_with_frames(df_raw: DataFrame, uni_df: DataFrame,
                          bi_df: DataFrame, log_alpha: float,
                          n_buckets: int, text_col: str, id_col: str,
                          broadcast_model: bool) -> DataFrame:
    """The shared join-scoring plan: the corpus explodes to one row per
    adjacent pair (explode_outer keeps 0/1-token docs), left-joins the
    bigram table on the pair key and the unigram table on the
    continuation bucket (backoff), then re-aggregates per input ROW
    (monotonic row id, so duplicate doc ids keep the map path's
    one-out-per-in cardinality) — partial
    aggregation collapses each partition's positions before the
    exchange, so shuffle volume is ~1 row per doc, not per token.
    First-token unigram joins AFTER the aggregate, on the ≤|docs| frame.
    ``broadcast_model=False`` (a frames model past the broadcast bound)
    drops the hints and lets AQE pick the join strategy for the exploded
    pair stream. Value-identical to the map path even though F.sum
    reassociates the per-pair terms: every model logp is a dyadic
    multiple of 2^-20 with |logp| < 64, so a per-doc sum is exact
    integer arithmetic in doubles (< 2^52) and therefore
    order-independent — the same argument the DuckDB oracle relies on."""
    from funnel_rocket_spark.operators.sampling import _md5_bucket

    hint = F.broadcast if broadcast_model else (lambda d: d)
    tk = F.coalesce(tokens(F.col(text_col)), F.array().cast("array<string>"))
    bs = F.transform(tk, lambda t: _md5_bucket(t, n_buckets).cast("int"))
    n = F.size("__bs")
    pairs = F.zip_with(
        F.slice("__bs", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("__bs", 2, F.greatest(n - 1, F.lit(0))),
        lambda p, c: F.struct(
            (p.cast("long") * n_buckets + c).alias("pc"),
            c.alias("cb")))
    # group the re-aggregation on a per-ROW key, not id_col: the map path
    # emits one output row per input row, and collapsing duplicate doc
    # ids here would let strategy='auto' change result cardinality when
    # the model crosses the literal-map caps
    staged = (df_raw.withColumn("__bs", bs)
              .withColumn("__rid", F.monotonically_increasing_id())
              .select("__rid", F.col(id_col), n.alias("__n"),
                      F.when(n > 0, F.element_at("__bs", 1))
                      .alias("__first_b"),  # ANSI: bare element_at throws
                      # on empty arrays instead of returning null
                      F.explode_outer(pairs).alias("__pr")))
    alpha = F.lit(float(log_alpha))
    scored = (staged
              .join(hint(bi_df),
                    staged["__pr"]["pc"] == bi_df["__pc"], "left")
              .join(hint(uni_df),
                    staged["__pr"]["cb"] == uni_df["__b"], "left"))
    pair_lp = F.when(F.col("__pr").isNotNull(),
                     F.coalesce(F.col("__bv"), alpha + F.col("__uv"))) \
        .otherwise(F.lit(0.0))
    per_doc = (scored.groupBy("__rid")
               .agg(F.first(id_col).alias(id_col),
                    F.first("__n").alias("__n"),
                    F.first("__first_b").alias("__first_b"),
                    F.sum(pair_lp).alias("__plp")))
    fu = uni_df.select(F.col("__b").alias("__fb"),
                       F.col("__uv").alias("__fv"))
    out = per_doc.join(hint(fu),
                       per_doc["__first_b"] == fu["__fb"], "left")
    lp = (F.when(F.col("__n") > 0, F.coalesce(F.col("__fv"), F.lit(0.0)))
          .otherwise(F.lit(0.0))
          + F.coalesce(F.col("__plp"), F.lit(0.0)))
    return out.select(
        F.col(id_col),
        F.col("__n").alias("n_tokens"),
        F.round(lp, 6).alias("logprob_sum"),
        F.round(-lp / F.greatest(F.col("__n"), F.lit(1)), 6)
        .alias("avg_nll"))


def lm_model_save(model: dict, path: str) -> None:
    """Persist a trained bigram LM to ``path`` so downstream runs score
    without retraining (a deployed CCNet gate trains its KenLM once and
    ships the artifact; this is that artifact for both trainer shapes).

    Layout: frames models write their uni/bi tables as parquet
    (``uni.parquet`` / ``bi.parquet`` — the model never passes through
    the driver, same guarantee as training); dict models inline the two
    bounded maps. ``meta.json`` carries the scalars and is written LAST —
    its presence marks the artifact complete, so a killed save can never
    be mistaken for a model (the load gate checks it first)."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    meta = {k: model[k] for k in
            ("log_alpha", "n_buckets", "smoothing", "top_bigrams")}
    if model.get("frames"):
        model["uni_df"].write.mode("overwrite").parquet(
            os.path.join(path, "uni.parquet"))
        model["bi_df"].write.mode("overwrite").parquet(
            os.path.join(path, "bi.parquet"))
        meta["frames"] = True
        meta["n_bigrams"] = model.get("n_bigrams")
    else:
        meta["frames"] = False
        meta["uni"] = {str(k): v for k, v in model["uni"].items()}
        meta["bi"] = {str(k): v for k, v in model["bi"].items()}
    tmp = os.path.join(path, "meta.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "meta.json"))


def lm_model_load(spark, path: str) -> dict:
    """Load a model saved by :func:`lm_model_save`; returns the same
    dict shape the matching trainer produced, ready for
    :func:`lm_score`. Frames model tables are read lazily — scoring
    joins stream straight from the artifact parquet, so a 10⁷-bigram
    model still never passes through the driver."""
    import json
    import os

    meta_path = os.path.join(path, "meta.json")
    if not os.path.isfile(meta_path):
        raise FileNotFoundError(
            f"no complete LM artifact at {path} (meta.json missing — "
            "save interrupted or wrong directory)")
    with open(meta_path) as fh:
        meta = json.load(fh)
    model = {"log_alpha": float(meta["log_alpha"]),
             "n_buckets": int(meta["n_buckets"]),
             "smoothing": float(meta["smoothing"]),
             "top_bigrams": int(meta["top_bigrams"])}
    if meta.get("frames"):
        model["uni_df"] = spark.read.parquet(
            os.path.join(path, "uni.parquet"))
        model["bi_df"] = spark.read.parquet(
            os.path.join(path, "bi.parquet"))
        model["n_bigrams"] = (int(meta["n_bigrams"])
                              if meta.get("n_bigrams") is not None else None)
        model["frames"] = True
    else:
        model["uni"] = {int(k): float(v) for k, v in meta["uni"].items()}
        model["bi"] = {int(k): float(v) for k, v in meta["bi"].items()}
    return model


def lm_nll(df_raw: DataFrame, df_target: DataFrame, text_col: str = "text",
           id_col: str = "doc_id", n_buckets: int = 256,
           smoothing: float = 1.0, top_bigrams: int = 1024,
           strategy: str = "auto", frames: bool = False) -> DataFrame:
    """Convenience composition: train on ``df_target``, score ``df_raw``
    (the CCNet recipe end-to-end). Filter downstream on ``avg_nll`` —
    low = reads like the target corpus. ``frames=True`` trains via
    :func:`lm_bigram_model_frames` (model stays on the cluster; no
    collect bound on the params)."""
    if frames:
        model = lm_bigram_model_frames(df_target, text_col, n_buckets,
                                       smoothing, top_bigrams)
    else:
        model = lm_bigram_model(df_target, text_col, n_buckets, smoothing,
                                top_bigrams)
    return lm_score(df_raw, model, text_col, id_col, strategy=strategy)
