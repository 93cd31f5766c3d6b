"""Unit tests for text-analysis operators with hand-computed expectations."""

from funnel_rocket_spark.operators import text


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # tokens: [a, a, a, b] -> dup tokens 2/4; 2-grams [a a, a a, a b]
            # -> 1/3 dup; 3-grams [a a a, a a b] -> 0/2 dup
            (1, "a a  a b"),
            # no repetition at any granularity
            (2, "x y z"),
            # fewer tokens than n: empty gram lists -> 0.0 via guarded denom
            (3, "solo"),
            (4, ""),
        ],
        "doc_id INT, text STRING",
    )
    rows = {r["doc_id"]: r for r in text.repetition_stats(df).collect()}

    assert rows[1]["n_tokens"] == 4
    assert rows[1]["dup_token_frac"] == 0.5
    assert rows[1]["dup_2gram_frac"] == round(1 / 3, 6)
    assert rows[1]["dup_3gram_frac"] == 0.0

    assert rows[2]["n_tokens"] == 3
    assert rows[2]["dup_token_frac"] == 0.0
    assert rows[2]["dup_2gram_frac"] == 0.0
    assert rows[2]["dup_3gram_frac"] == 0.0

    assert rows[3]["n_tokens"] == 1
    assert rows[3]["dup_2gram_frac"] == 0.0
    assert rows[3]["dup_3gram_frac"] == 0.0

    assert rows[4]["n_tokens"] == 0
    assert rows[4]["dup_token_frac"] == 0.0


def test_chunk_documents_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x"), (3, "")],
        "doc_id INT, text STRING",
    )
    out = text.chunk_documents(df, max_tokens=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r["chunk_id"])

    assert [c["chunk_text"] for c in by_doc[1]] == ["a b", "c d", "e"]
    assert [c["n_chunk_tokens"] for c in by_doc[1]] == [2, 2, 1]
    # every doc yields >= 1 chunk, even empty ones
    assert [c["chunk_text"] for c in by_doc[2]] == ["x"]
    assert [c["chunk_text"] for c in by_doc[3]] == [""]
    assert by_doc[3][0]["n_chunk_tokens"] == 0


def test_reconstruction_operators_preserve_casing(spark):
    """chunk_documents / pack_token_blocks / remove_duplicate_spans emit
    TRAINING TEXT — reconstruction must keep the original casing (the
    lowercased tokenizer default is for counting/matching operators).
    All three silently lowercased their output once; testdata is mostly
    lowercase, so only a crafted doc pins this."""
    import hashlib

    df = spark.createDataFrame(
        [(1, "Hello World THIS IS Mixed Case")], "doc_id long, text string")
    chunks = sorted(text.chunk_documents(df, max_tokens=3).collect(),
                    key=lambda r: r["chunk_id"])
    assert [c["chunk_text"] for c in chunks] == ["Hello World THIS",
                                                 "IS Mixed Case"]
    blocks = text.pack_token_blocks(df, block_size=16, shards=1).collect()
    assert blocks[0]["block_md5"] == hashlib.md5(
        b"Hello World THIS IS Mixed Case").hexdigest()
    # span REMOVAL: no duplicated 20-token span in one short doc, so the
    # doc passes through — with its casing intact
    out = text.remove_duplicate_spans(df).collect()[0]
    assert out["clean_text"] == "Hello World THIS IS Mixed Case"
    assert out["n_removed_tokens"] == 0


def test_pack_token_blocks_string_ids(spark):
    """md5 sharding must accept non-numeric ids (raw pmod crashed with
    CAST_INVALID_INPUT under ANSI) and spread structured numeric ids
    (all-even ids once left half the shards empty)."""
    df = spark.createDataFrame(
        [(f"doc-{i}", "a b c") for i in range(40)],
        "doc_id string, text string")
    rows = text.pack_token_blocks(df, block_size=8, shards=4).collect()
    assert sum(r["n_tokens"] for r in rows) == 120
    even = spark.createDataFrame(
        [(2 * i, "w x y z") for i in range(64)], "doc_id long, text string")
    shards_used = {r["shard"] for r in
                   text.pack_token_blocks(even, block_size=8,
                                          shards=8).collect()}
    assert len(shards_used) == 8  # all-even ids still hit every shard


def test_chunk_documents_overlapping_stride(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id INT, text STRING")
    out = sorted(text.chunk_documents(df, max_tokens=3, stride=2).collect(),
                 key=lambda r: r["chunk_id"])
    assert [c["chunk_text"] for c in out] == ["a b c", "c d e"]


def test_vocabulary_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog"), (3, "")],
        "doc_id INT, text STRING",
    )
    rows = {r["token"]: r for r in text.vocabulary(df).collect()}
    assert rows["the"]["n_occurrences"] == 3
    assert rows["the"]["n_docs"] == 2
    assert rows["cat"]["n_occurrences"] == 1
    assert rows["cat"]["n_docs"] == 1
    assert "" not in rows

    top = text.vocabulary(df, min_count=2, top=5).collect()
    assert [r["token"] for r in top] == ["the"]


def test_pack_token_blocks_invariants(spark):
    df = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(i % 7 + 1)))
         for i in range(40)],
        "doc_id INT, text STRING",
    )
    rows = text.pack_token_blocks(df, block_size=8, shards=4).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    total_tokens = sum(i % 7 + 1 for i in range(40))
    assert sum(r["n_tokens"] for r in rows) == total_tokens
    for shard, blocks in by_shard.items():
        blocks.sort(key=lambda r: r["block_id"])
        # consecutive block ids from 0
        assert [b["block_id"] for b in blocks] == list(range(len(blocks)))
        # every block is exactly block_size except the shard's tail
        for b in blocks[:-1]:
            assert b["n_tokens"] == 8
        assert 1 <= blocks[-1]["n_tokens"] <= 8


def test_pack_token_blocks_single_shard_exact_stream(spark):
    # one shard -> the packed stream is the full concat in doc_id order
    import hashlib
    docs = [(1, "a b c"), (2, "d e"), (3, "f g h i")]
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    rows = sorted(text.pack_token_blocks(df, block_size=4, shards=1).collect(),
                  key=lambda r: r["block_id"])
    stream = "a b c d e f g h i".split()
    want = [stream[0:4], stream[4:8], stream[8:9]]
    assert [r["n_tokens"] for r in rows] == [4, 4, 1]
    for r, blk in zip(rows, want):
        assert r["block_md5"] == hashlib.md5(" ".join(blk).encode()).hexdigest()


def test_tfidf_top_terms_hand_computed(spark):
    import math

    df = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry")],
        "doc_id INT, text STRING",
    )
    rows = text.tfidf_top_terms(df, top=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r["term_rank"])
    # doc1: apple tf=2/3 idf=ln(3/1); banana tf=1/3 idf=ln(3/2)
    assert d1[0]["token"] == "apple"
    assert d1[0]["tfidf"] == round((2 / 3) * math.log(3 / 1), 6)
    assert d1[1]["token"] == "banana"
    assert d1[1]["tfidf"] == round((1 / 3) * math.log(3 / 2), 6)
    # doc3: cherry appears in 2 of 3 docs, tf=1
    [d3] = by_doc[3]
    assert d3["token"] == "cherry"
    assert d3["tfidf"] == round(math.log(3 / 2), 6)


def test_redact_pii_hand_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at john.doe+x@sub.example.co.uk today"),
            (2, "server 192.168.1.255 and backup 10.0.0.1"),
            (3, "call +1-555-0100-1234 or 44 20 7946-0958"),
            (4, "clean text with no pii at all"),
            (5, "a@b.io twice a@b.io and ip 8.8.8.8"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text.redact_pii(df).collect()}
    assert rows[1]["redacted"] == "mail me at <EMAIL> today"
    assert rows[1]["n_redactions"] == 1
    assert rows[2]["redacted"] == "server <IP> and backup <IP>"
    assert rows[2]["n_redactions"] == 2
    assert "<PHONE>" in rows[3]["redacted"]
    assert rows[3]["n_redactions"] == 2
    assert rows[4]["redacted"] == "clean text with no pii at all"
    assert rows[4]["n_redactions"] == 0
    assert rows[5]["redacted"] == "<EMAIL> twice <EMAIL> and ip <IP>"
    assert rows[5]["n_redactions"] == 3


def test_classifier_score_shape_and_determinism(spark):
    from funnel_rocket_spark.operators.text import classifier_score

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"),
         (3, "completely different words here"), (4, "")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["clf_score"]
           for r in classifier_score(df).collect()}
    assert out[1] == out[2]            # same text → same score
    assert out[1] != out[3]            # different text → different score
    assert all(0.0 < s < 1.0 for s in out.values())
    assert out[4] == 0.5               # empty doc → sigmoid(0)
    # different salt = different model
    other = {r["doc_id"]: r["clf_score"]
             for r in classifier_score(df, salt="w2").collect()}
    assert other[1] != out[1]


def test_classifier_weights_strategies_agree(spark):
    """Literal-map and broadcast-join scoring are the same function."""
    from funnel_rocket_spark import benchqueries as bq
    from funnel_rocket_spark.operators import text

    docs = bq.load_table(spark, "/root/testdata/sf0.001", "documents")
    w = bq._trained_weights()
    m = {r["doc_id"]: r["clf_score"] for r in
         text.classifier_score_weights(docs, w, strategy="map").collect()}
    j = {r["doc_id"]: r["clf_score"] for r in
         text.classifier_score_weights(docs, w, strategy="join").collect()}
    assert m == j and len(m) == docs.count()


def test_classifier_weights_hand_computed(spark):
    """Mean-over-all-tokens contract: known weights, unknown tokens weigh
    default, empty doc scores 0.5."""
    import math

    from funnel_rocket_spark.operators import text

    df = spark.createDataFrame(
        [(1, "good good bad"), (2, "unseen words only"), (3, "")],
        "doc_id long, text string")
    w = {"good": 0.5, "bad": -1.0}
    for strategy in ("map", "join"):
        got = {r["doc_id"]: r["clf_score"] for r in
               text.classifier_score_weights(
                   df, w, strategy=strategy).collect()}
        assert abs(got[1] - round(1 / (1 + math.exp(-(0.5 + 0.5 - 1.0) / 3)), 6)) < 1e-9
        assert got[2] == 0.5  # three unknown tokens, default 0
        assert got[3] == 0.5  # empty doc
        # non-zero default shifts unknown tokens
        got_d = {r["doc_id"]: r["clf_score"] for r in
                 text.classifier_score_weights(
                     df, w, default=1.0, strategy=strategy).collect()}
        assert got_d[2] == round(1 / (1 + math.exp(-1.0)), 6)


def test_classifier_weights_plan_shapes(spark):
    """map path: zero exchanges (pure projection, like the hashing twin);
    join path: broadcast only — the vocabulary never sort-merge-joins."""
    from funnel_rocket_spark import benchqueries as bq
    from funnel_rocket_spark.operators import text
    from funnel_rocket_spark.plans import count_exchanges, formatted_plan

    docs = bq.load_table(spark, "/root/testdata/sf0.001", "documents")
    w = bq._trained_weights()
    assert count_exchanges(
        text.classifier_score_weights(docs, w, strategy="map")) == 0
    jplan = formatted_plan(
        text.classifier_score_weights(docs, w, strategy="join"))
    assert "BroadcastHashJoin" in jplan, jplan
    assert "SortMergeJoin" not in jplan, jplan


def test_classifier_null_text_scores_half_everywhere(spark):
    """ADVICE r4 (low): null text is the empty document — sigmoid(0)=0.5 —
    in BOTH classifier_score_weights strategies and the hashing twin; the
    map path's HOF-aggregate used to propagate null."""
    from funnel_rocket_spark.operators import text

    df = spark.createDataFrame(
        [(1, None), (2, "good stuff"), (3, "")],
        "doc_id long, text string")
    w = {"good": 0.5}
    for strategy in ("map", "join"):
        got = {r["doc_id"]: r["clf_score"] for r in
               text.classifier_score_weights(df, w, strategy=strategy).collect()}
        assert got[1] == 0.5, (strategy, got)
        assert got[3] == 0.5, (strategy, got)
        assert got[2] != 0.5
    hashed = {r["doc_id"]: r["clf_score"]
              for r in text.classifier_score(df).collect()}
    assert hashed[1] == 0.5 and hashed[3] == 0.5
    assert None not in hashed.values()


def test_gopher_filter_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # clean doc: passes everything at the relaxed test thresholds
            (1, "The cat and the dog have fun with that ball of yarn to be "
                "sure and that is all."),
            # bullet-heavy + ellipsis lines
            (2, "• one two three\n• four five six\nclosing line here..."),
            # symbol noise: 4 '#' + one '...' over 4 words
            (3, "## ## tag soup..."),
            # numeric words fail the alpha rule
            (4, "1 2 3 4 5 6 7 8 9 10"),
            (5, None),
        ],
        "doc_id INT, text STRING",
    )
    rows = {r["doc_id"]: r for r in text.gopher_quality_filter(
        df, min_words=4, min_stopword_hits=2).collect()}

    r1 = rows[1]
    assert r1["n_words"] == 19 and r1["stopword_hits"] >= 5
    assert r1["passes"] is True

    r2 = rows[2]
    assert r2["bullet_line_frac"] == round(2 / 3, 6)
    assert r2["ellipsis_line_frac"] == round(1 / 3, 6)
    assert r2["rule_ellipsis_lines"] is False  # > 0.3

    r3 = rows[3]
    # 4 hashes + 1 '...' over 4 words
    assert r3["symbol_word_ratio"] == round(5 / 4, 6)
    assert r3["rule_symbol_ratio"] is False

    r4 = rows[4]
    assert r4["alpha_word_frac"] == 0.0
    assert r4["rule_alpha_words"] is False

    # null text = empty doc: definite all-zero metrics, definite fail
    r5 = rows[5]
    assert r5["n_words"] == 0 and r5["passes"] is False


def test_gopher_and_c4_plans_are_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id INT, text STRING")
    for out in (text.gopher_quality_filter(df), text.c4_line_filter(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_c4_line_filter_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "A good long sentence that survives the filter.\n"
                "too short.\n"
                "No terminal punctuation on this long line here\n"
                "Please accept our cookie policy before you continue.\n"
                "Another fine sentence stays in the document!"),
            (2, "   \n\n"),
            (3, None),
        ],
        "doc_id INT, text STRING",
    )
    rows = {r["doc_id"]: r for r in text.c4_line_filter(
        df, min_words_per_line=4).collect()}

    r1 = rows[1]
    assert r1["n_lines"] == 5 and r1["n_kept"] == 2
    assert r1["clean_text"] == (
        "A good long sentence that survives the filter.\n"
        "Another fine sentence stays in the document!")

    # blank-only and null docs: zero lines, empty output
    for i in (2, 3):
        assert rows[i]["n_lines"] == 0 and rows[i]["clean_text"] == ""

    # terminal-punct rule off: the unpunctuated line comes back
    relaxed = {r["doc_id"]: r for r in text.c4_line_filter(
        df, min_words_per_line=4, require_terminal_punct=False).collect()}
    assert relaxed[1]["n_kept"] == 3


def _reference_perceptron(docs, vocab, iterations, lr=0.5):
    """Pure-Python batch perceptron with the same contract."""
    feats = [(sorted({t for t in txt.lower().split() if t in vocab}
                     | {"__bias__"}), y) for txt, y in docs]
    w = {t: 0.0 for t in list(vocab) + ["__bias__"]}
    mistakes = []
    for _ in range(iterations):
        grad, n = {}, 0
        for ft, y in feats:
            yhat = 1 if sum(w[t] for t in ft) > 0 else 0
            if yhat != y:
                n += 1
                for t in ft:
                    grad[t] = grad.get(t, 0) + (y - yhat)
        for t, g in grad.items():
            w[t] += lr * g
        mistakes.append(n)
        if n == 0:
            break
    return w, mistakes


def test_perceptron_matches_python_reference(spark):
    import pyspark.sql.functions as F

    vocab = ["apple", "pear", "plum", "kiwi", "fig"]
    # deterministic, NOT linearly separable corpus
    docs = [(f"{'apple pear' if i % 3 == 0 else 'plum kiwi'} fig"
             + (" apple" if i % 5 == 0 else ""),
             1 if i % 2 == 0 else 0) for i in range(40)]
    df = spark.createDataFrame(
        [(i, t, y) for i, (t, y) in enumerate(docs)],
        "doc_id INT, text STRING, y INT")
    got_w, got_m = text.train_classifier_perceptron(
        df, F.col("y") == 1, vocab, iterations=4)
    want_w, want_m = _reference_perceptron(docs, vocab, iterations=4)
    assert got_m == want_m
    assert got_w == want_w  # dyadic arithmetic: exact equality, no tolerance


def test_perceptron_converges_on_separable_data(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, "good spark text" if i % 2 == 0 else "bad slow text")
         for i in range(20)],
        "doc_id INT, text STRING")
    w, m = text.train_classifier_perceptron(
        df, F.col("text").contains("spark"),
        ["good", "spark", "bad", "slow", "text"], iterations=10)
    assert m[-1] == 0 and len(m) < 10  # early-stops once converged
    # learned weights feed straight into the inference operator
    scored = text.classifier_score_weights(
        df, {t: v for t, v in w.items() if t != "__bias__"})
    assert scored.count() == 20


def test_perceptron_vocab_cap(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(1, "a")], "doc_id INT, text STRING")
    try:
        text.train_classifier_perceptron(
            df, F.lit(True), [f"t{i}" for i in range(3000)])
        raise AssertionError("expected ValueError")
    except ValueError as exc:
        assert "literal-map cap" in str(exc)


def _py_bpe(texts, merges, lowercase=False):
    """Pure-Python reference for the sequential-replace BPE spec.

    Word boundaries are the ASCII class Java's \\s+ matches — NOT
    str.split(), which also splits on Unicode whitespace (U+00A0 etc.)
    and would diverge from the expr path's regex semantics."""
    import re
    ascii_ws = re.compile(r"[ \t\n\x0b\f\r]+")
    out = []
    for t in texts:
        t = (t or "")
        if lowercase:
            t = t.lower()
        words = []
        for w in (x for x in ascii_ws.split(t) if x):
            s = " ".join(w)
            for a, b in merges:
                s = s.replace(f"{a} {b}", f"{a}{b}")
            words.append(s)
        joined = " ".join(words)
        out.append((len(joined.split(" ")) if joined else 0, joined))
    return out


def test_bpe_tokenize_matches_python_reference(spark):
    texts = [
        "the theater is there and then the thing",
        "ing sing singing in the rain ...",
        None, "",
        "a…b   c\n\nthe the",          # unicode + odd whitespace
        "overlap: bbb bb b",            # left-to-right non-overlap merges
        "nb\xa0sp the　ideo ls",  # non-ASCII ws is NOT a boundary
    ]
    merges = [("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"),
              ("b", "b"), ("e", "r"), ("the", "r"), ("s", "ing")]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    want = {i: w for i, w in enumerate(_py_bpe(texts, merges))}
    for strategy in ("expr", "arrow"):
        got = {r["doc_id"]: (r["n_bpe_tokens"], r["bpe_text"])
               for r in text.bpe_tokenize(df, merges,
                                          strategy=strategy).collect()}
        assert got == want, strategy


def test_bpe_expr_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id INT, text STRING")
    out = text.bpe_tokenize(df, [("a", "b")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bpe_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, "ab c")], "doc_id INT, text STRING")
    # empty table = the char-level base case (learn_bpe's no-pairs result)
    for strat in ("expr", "arrow"):
        r = text.bpe_tokenize(df, [], strategy=strat).collect()[0]
        assert (r["n_bpe_tokens"], r["bpe_text"]) == (3, "a b c")
    with pytest.raises(ValueError):
        text.bpe_tokenize(df, [("a", "")])
    with pytest.raises(ValueError):
        text.bpe_tokenize(df, [("a b", "c")])
    with pytest.raises(ValueError):
        text.bpe_tokenize(df, [("a", "b")] * 5000, strategy="expr")


def _py_learn_bpe(word_counts, n_merges, min_count=2):
    """Greedy reference trainer over a word→count table (Sennrich Alg. 1
    with the engine's deterministic lexicographic tie-break)."""
    wf = {" ".join(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for sym, c in wf.items():
            toks = sym.split(" ")
            for i in range(len(toks) - 1):
                p = f"{toks[i]} {toks[i + 1]}"
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        pat = best[0]
        a, b = pat.split(" ")
        merges.append((a, b))
        wf = {sym.replace(pat, a + b): c for sym, c in wf.items()}
    return merges


def test_learn_bpe_matches_python_reference(spark):
    texts = ["the theater hears the heat", "then there the the",
             "heat hears earth", None, "the"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    counts = {}
    for t in texts:
        for w in (t or "").split():
            counts[w] = counts.get(w, 0) + 1
    want = _py_learn_bpe(counts, 8)
    got = text.learn_bpe(df, 8)
    assert got == want
    # layout-independent: same merges from a differently-partitioned corpus
    assert text.learn_bpe(df.repartition(7), 8) == want
    # learn → apply roundtrip compresses: fewer BPE tokens than chars
    enc = text.bpe_tokenize(df, got)
    import pyspark.sql.functions as F
    n_bpe, n_chars = (df.join(enc, "doc_id")
                      .agg(F.sum("n_bpe_tokens"),
                           F.sum(F.length(F.regexp_replace(
                               F.coalesce("text", F.lit("")), r"\s", ""))))
                      .collect()[0])
    assert 0 < n_bpe < n_chars


def test_gopher_unicode_ellipsis_counts_in_symbol_ratio(spark):
    # one '…' over 2 words = ratio 0.5 > 0.1 → rule fails (it previously
    # escaped the symbol-ratio rule entirely); line-end rule also trips
    df = spark.createDataFrame([(1, "hello world…")], "doc_id INT, text STRING")
    r = text.gopher_quality_filter(df, min_words=1,
                                   min_stopword_hits=0).collect()[0]
    assert r["symbol_word_ratio"] == 0.5
    assert r["rule_symbol_ratio"] is False
    assert r["ellipsis_line_frac"] == 1.0


def test_gopher_defaults_pin_published_values(spark):
    """Rae et al. 2021 Appendix A1.1 constants, pinned verbatim (the
    mechanism is oracle-verified; the constants are what a user silently
    trusts). A deviation from these is an API break, not a tweak."""
    import inspect

    sig = inspect.signature(text.gopher_quality_filter)
    d = {k: v.default for k, v in sig.parameters.items()}
    assert d["min_words"] == 50 and d["max_words"] == 100_000
    assert d["min_mean_word_len"] == 3.0 and d["max_mean_word_len"] == 10.0
    assert d["max_symbol_word_ratio"] == 0.1
    assert d["max_bullet_line_frac"] == 0.9
    assert d["max_ellipsis_line_frac"] == 0.3
    assert d["min_alpha_word_frac"] == 0.8
    assert d["min_stopword_hits"] == 2
    assert text.GOPHER_REQUIRED_STOPWORDS == [
        "the", "be", "to", "of", "and", "that", "have", "with"]


def test_pack_blocks_pretokenized_bpe_counts(spark):
    import pyspark.sql.functions as F

    merges = [("t", "h"), ("th", "e"), ("i", "n"), ("in", "g")]
    df = spark.createDataFrame(
        [(i, "the thing sing going in the ring " * (i + 1))
         for i in range(6)], "doc_id long, text string")
    enc = text.bpe_tokenize(df, merges)
    total_bpe = enc.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    packed = text.pack_token_blocks(
        enc.withColumn("toks", F.split("bpe_text", " ")),
        id_col="doc_id", block_size=16, shards=2,
        pretokenized_col="toks")
    rows = packed.collect()
    # conservation: every BPE token lands in exactly one block
    assert sum(r["n_tokens"] for r in rows) == total_bpe
    # all blocks are exactly block_size except <= one tail per shard
    tails = [r for r in rows if r["n_tokens"] != 16]
    assert len(tails) <= 2
    # and differs from whitespace packing (BPE tokens != words)
    words = text.pack_token_blocks(df, block_size=16, shards=2)
    assert (sum(r["n_tokens"] for r in words.collect()) != total_bpe)


def test_bpe_differential_random_corpora(spark):
    """Hypothesis differential: Spark expr-path BPE == pure-Python
    reference on random corpora and random merge tables."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from("abcd…$ \xa0")  # \xa0: non-ASCII ws in-word
    texts_st = st.lists(st.text(alphabet, max_size=18), min_size=1,
                        max_size=5)
    sym = st.text(st.sampled_from("abcd"), min_size=1, max_size=2)
    merges_st = st.lists(st.tuples(sym, sym), min_size=1, max_size=6)

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(texts=texts_st, merges=merges_st)
    def prop(texts, merges):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")
        got = {r["doc_id"]: (r["n_bpe_tokens"], r["bpe_text"])
               for r in text.bpe_tokenize(df, merges).collect()}
        want = {i: w for i, w in enumerate(_py_bpe(texts, merges))}
        assert got == want

    prop()


def test_perceptron_predict_reproduces_converged_labels(spark):
    import pyspark.sql.functions as F

    rows = ([(i, "good spark fast data") for i in range(12)]
            + [(100 + i, "bad slow junk") for i in range(12)]
            + [(200, "nothing from vocab here"), (201, None)])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    label = F.array_contains(F.split(F.lower("text"), r"\s+"), "spark")
    vocab = ["spark", "fast", "slow", "junk", "data"]
    w, mistakes = text.train_classifier_perceptron(
        df, label, vocab, iterations=10)
    assert mistakes[-1] == 0  # converged on separable data
    pred = {r["doc_id"]: r["label_pred"]
            for r in text.perceptron_predict(df, w).collect()}
    truth = {r["doc_id"]: int(bool(r["text"]) and "spark" in r["text"])
             for r in df.collect()}
    assert pred == truth
    # zero-evidence docs sit at margin == bias, classified by sign
    margins = {r["doc_id"]: r["margin"]
               for r in text.perceptron_predict(df, w).collect()}
    assert margins[200] == margins[201] == w["__bias__"]


def _py_lm(raw, target, nb=256, s=1.0, k=1024):
    """Pure-Python reference for the hashed bigram LM (CCNet-shaped)."""
    import hashlib
    import math

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:11], 16) % nb

    q = float(1 << 20)

    def qln(x):
        return round(math.log(x) * q) / q

    uc, bg = {}, {}
    for t in target:
        bs = [bucket(w) for w in (t or "").lower().split()]
        for b in bs:
            uc[b] = uc.get(b, 0) + 1
        for p, c in zip(bs, bs[1:]):
            key = p * nb + c
            bg[key] = bg.get(key, 0) + 1
    total = sum(uc.values())
    uni = {b: qln((uc.get(b, 0) + s) / (total + s * nb)) for b in range(nb)}
    top = sorted(bg.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    bi = {key: qln((c + s) / (uc.get(key // nb, 0) + s * nb))
          for key, c in top}
    la = qln(0.4)
    out = {}
    for i, t in enumerate(raw):
        bs = [bucket(w) for w in (t or "").lower().split()]
        n = len(bs)
        if n == 0:
            out[i] = (0, 0.0, 0.0)
            continue
        lp = uni[bs[0]]
        for p, c in zip(bs, bs[1:]):
            lp += bi.get(p * nb + c, la + uni[c])
        out[i] = (n, round(lp, 6), round(-lp / max(n, 1), 6))
    return out


def test_lm_nll_matches_python_reference(spark):
    raw = ["the cat sat on the mat", "zq zq zq xkcd", "the the the",
           None, "", "solo"]
    target = ["the cat sat", "the cat ran", "on the mat"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(raw)], "doc_id long, text string")
    tgt = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(target)],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["logprob_sum"], r["avg_nll"])
           for r in text.lm_nll(df, tgt).collect()}
    assert got == _py_lm(raw, target)  # dyadic quantization -> exact
    # CCNet semantics: target-like docs score lower avg_nll than junk
    assert got[0][2] < got[1][2]
    # layout independence
    got2 = {r["doc_id"]: (r["n_tokens"], r["logprob_sum"], r["avg_nll"])
            for r in text.lm_nll(df.repartition(5), tgt).collect()}
    assert got == got2


def test_lm_model_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        text.lm_bigram_model(df, n_buckets=1)
    with pytest.raises(ValueError):
        text.lm_bigram_model(df, smoothing=0.0)
    with pytest.raises(ValueError):
        text.lm_bigram_model(df, top_bigrams=10**6)
    # zero bigram table = pure backoff unigram LM, still scores
    m = text.lm_bigram_model(df, top_bigrams=0)
    rows = text.lm_score(df, m).collect()
    assert rows[0]["n_tokens"] == 2


def test_lm_score_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    m = text.lm_bigram_model(df)
    plan = text.lm_score(df, m)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_lm_differential_random_corpora(spark):
    """Hypothesis differential: in-engine LM == pure-Python reference on
    random corpora (small bucket space forces bigram collisions and
    backoff paths)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(st.sampled_from("abc"), min_size=1, max_size=3)
    doc = st.lists(word, max_size=6).map(" ".join)
    corpus = st.lists(doc, min_size=1, max_size=4)

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(raw=corpus, target=corpus)
    def prop(raw, target):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(raw)], "doc_id long, text string")
        tgt = spark.createDataFrame(
            [(100 + i, t) for i, t in enumerate(target)],
            "doc_id long, text string")
        got = {r["doc_id"]: (r["n_tokens"], r["logprob_sum"], r["avg_nll"])
               for r in text.lm_nll(df, tgt, n_buckets=16,
                                    top_bigrams=8).collect()}
        want = _py_lm(raw, target, nb=16, k=8)
        assert got == want
        # frames-native trainer hits the same reference bit-for-bit
        got_f = {r["doc_id"]: (r["n_tokens"], r["logprob_sum"],
                               r["avg_nll"])
                 for r in text.lm_nll(df, tgt, n_buckets=16, top_bigrams=8,
                                      frames=True).collect()}
        assert got_f == want

    prop()


def test_bpe_arrow_path_large_merge_table(spark):
    """The arrow path's reason to exist is tables beyond the 4096-entry
    expression cap (GPT-2 scale). Exercise it with a 10k-merge table —
    auto must route to arrow, and results must match the pure-Python
    reference exactly (the char-subset prefilter is semantics-neutral)."""
    import itertools

    # 10k merges over a growing symbol pool: start from char pairs, then
    # pair previously-merged symbols — every entry is structurally valid
    syms = list("abcdef")
    merges = []
    for a, b in itertools.cycle(itertools.product("abcdef", repeat=2)):
        if len(merges) >= 10_000:
            break
        left = syms[len(merges) % len(syms)]
        merges.append((left, a + b if len(merges) % 3 else b))
        if len(merges) % 7 == 0:
            syms.append(merges[-1][0] + merges[-1][1])
    assert len(merges) > text._BPE_EXPR_MERGE_CAP

    texts = ["abc def fedcba", "aaaa bbbb", "fade bead", None, "x y z"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bpe_tokens"], r["bpe_text"])
           for r in text.bpe_tokenize(df, merges).collect()}  # auto->arrow
    want = {i: w for i, w in enumerate(_py_bpe(texts, merges))}
    assert got == want
    # and the expr path refuses the oversized table explicitly
    import pytest

    with pytest.raises(ValueError, match="exceeds the literal-expression"):
        text.bpe_tokenize(df, merges, strategy="expr")


def test_learn_bpe_driver_equals_distributed_boundary_cases(spark):
    """The driver trainer must reproduce STRING-replace semantics: a
    merge (a, b) also fires across symbol boundaries (symbols [xa, b]
    render "xa b", matching "a b"), and junction-formed occurrences
    ([aa, a, a] -> "aaa a" still contains "aa a"). Corpora built to hit
    exactly those paths."""
    rows = [(i, t) for i, t in enumerate([
        "aa a a aa a a aa a", "xa b a b xa b", "a ba b a b",
        "aaa aa a", "b b b b a a a a", "ab ab a b ab",
        "xb a ya xb a", "a a a a a a"] * 2)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (4, 12):
        d = text.learn_bpe(df, n, strategy="driver")
        x = text.learn_bpe(df, n, strategy="distributed")
        assert d == x, (n, d, x)


def test_learn_bpe_segments_like_bpe_tokenize_on_exotic_chars(spark):
    """U+2028 (and NEL/U+2029) survive the ASCII \\s+ word split but are
    skipped by Java '.' — the trainer's char split must carry (?s) like
    bpe_tokenize's, or it trains over differently-segmented words than
    the tokenizer will ever see (the merge never applies at encode
    time). Pin the joint train->apply behavior on a U+2028-carrying
    corpus."""
    w = "x\u2028y"
    df = spark.createDataFrame(
        [(1, f"{w} {w} {w}")], "doc_id long, text string")
    merges = text.learn_bpe(df, 2, min_count=2, strategy="driver")
    assert merges == [("x", "\u2028"), ("x\u2028", "y")], merges
    assert merges == text.learn_bpe(df, 2, min_count=2,
                                    strategy="distributed")
    enc = text.bpe_tokenize(df, merges).collect()[0]
    assert enc["n_bpe_tokens"] == 3  # each word fully merges
    assert enc["bpe_text"] == f"{w} {w} {w}"


def test_learn_bpe_strategies_agree_random_corpora(spark):
    """Hypothesis differential: driver vs distributed trainer on random
    small-alphabet corpora (small alphabets maximize merge collisions,
    boundary matches, and tie-breaks)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from("ab ")
    texts_st = st.lists(st.text(alphabet, max_size=14),
                        min_size=1, max_size=6)

    @settings(max_examples=12, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(texts=texts_st, n=st.integers(1, 6))
    def prop(texts, n):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")
        d = text.learn_bpe(df, n, min_count=2, strategy="driver")
        x = text.learn_bpe(df, n, min_count=2, strategy="distributed")
        assert d == x, (texts, n, d, x)

    prop()


def test_bpe_merges_text_round_trip(spark):
    """learn -> export merges.txt -> re-import -> apply must equal
    applying the in-memory table directly (the interchange path with
    published tokenizer exports); headers/blank lines tolerated,
    malformed lines and unserializable symbols rejected."""
    import pytest

    df = spark.createDataFrame(
        [(1, "scan the column window order sort"),
         (2, "order order scan scan the window")],
        "doc_id long, text string")
    merges = text.learn_bpe(df, 8, min_count=2)
    txt = text.bpe_merges_to_text(merges)
    assert txt.startswith("#version")
    assert text.bpe_merges_from_text(txt) == merges
    direct = sorted(map(tuple, text.bpe_tokenize(df, merges).collect()))
    via_txt = sorted(map(tuple, text.bpe_tokenize(
        df, text.bpe_merges_from_text(txt)).collect()))
    assert direct == via_txt
    # tolerant parse: extra blanks + comment lines
    assert text.bpe_merges_from_text(
        "#version: 0.2\n\na b\n\n# note\nab c\n") == [("a", "b"),
                                                      ("ab", "c")]
    with pytest.raises(ValueError, match="not a pair"):
        text.bpe_merges_from_text("a b c\n")
    with pytest.raises(ValueError, match="serializable"):
        text.bpe_merges_to_text([("a", "b c")])
    with pytest.raises(ValueError, match="serializable"):
        text.bpe_merges_to_text([("", "b")])
    # UNICODE whitespace is in-word under the engine's ASCII-\s+
    # tokenization, so NBSP/U+2028-carrying symbols (learnable from web
    # corpora) must serialize and round-trip unharmed — str.isspace()/
    # str.strip()/str.splitlines are all Unicode-aware and would reject
    # or truncate them
    exotic = [("x", "\u2028"), ("a\xa0", "b"), ("c", "d\xa0")]
    assert text.bpe_merges_from_text(
        text.bpe_merges_to_text(exotic)) == exotic


def test_learn_bpe_auto_and_guards(spark):
    df = spark.createDataFrame(
        [(1, "the the there then")], "doc_id long, text string")
    want = text.learn_bpe(df, 4, strategy="distributed")
    # tiny vocab -> auto picks driver; result identical
    assert text.learn_bpe(df, 4, strategy="auto") == want
    # auto falls back to distributed when vocab exceeds the bound
    assert text.learn_bpe(df, 4, strategy="auto",
                          driver_max_vocab=1) == want
    import pytest
    with pytest.raises(ValueError, match="driver_max_vocab"):
        text.learn_bpe(df, 4, strategy="driver", driver_max_vocab=1)
    with pytest.raises(ValueError, match="strategy"):
        text.learn_bpe(df, 4, strategy="nope")


def test_lm_score_join_equals_map(spark):
    """Broadcast-join scorer == literal-map scorer on the same trained
    model (dyadic logps make both sums exact, so equality is bitwise),
    including the empty-bigram pure-backoff model and 0/1-token docs."""
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the the the"),
         (3, None), (4, ""), (5, "one"), (6, "cat mat unseen zz")],
        "doc_id long, text string")
    tgt = spark.createDataFrame(
        [(10, "the cat sat"), (11, "on the mat the cat")],
        "doc_id long, text string")
    for tb in (0, 64):
        m = text.lm_bigram_model(tgt, n_buckets=16, top_bigrams=tb)
        a = sorted(map(tuple, text.lm_score(
            docs, m, strategy="map").collect()))
        b = sorted(map(tuple, text.lm_score(
            docs, m, strategy="join").collect()))
        assert a == b, (tb, a, b)


def test_lm_frames_trainer_equals_dict_trainer(spark):
    """Frames-native trainer (model stays as DataFrames) == dict trainer
    bit-for-bit on the same corpus/params — the 2^-20 dyadic grid absorbs
    any JVM-vs-CPython ln() ulp difference. Covers the pure-backoff
    (top_bigrams=0) model, the empty target corpus, and 0/1-token docs."""
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the the the"),
         (3, None), (4, ""), (5, "one"), (6, "cat mat unseen zz")],
        "doc_id long, text string")
    tgt = spark.createDataFrame(
        [(10, "the cat sat"), (11, "on the mat the cat")],
        "doc_id long, text string")
    for tb in (0, 64):
        md = text.lm_bigram_model(tgt, n_buckets=16, top_bigrams=tb)
        mf = text.lm_bigram_model_frames(tgt, n_buckets=16, top_bigrams=tb)
        a = sorted(map(tuple, text.lm_score(
            docs, md, strategy="map").collect()))
        b = sorted(map(tuple, text.lm_score(docs, mf).collect()))
        assert a == b, (tb, a, b)
    # empty target: both degenerate to the uniform smoothed model
    empty = tgt.where("doc_id < 0")
    md = text.lm_bigram_model(empty, n_buckets=8, top_bigrams=4)
    mf = text.lm_bigram_model_frames(empty, n_buckets=8, top_bigrams=4)
    a = sorted(map(tuple, text.lm_score(docs, md, strategy="map").collect()))
    b = sorted(map(tuple, text.lm_score(docs, mf).collect()))
    assert a == b
    # the past-broadcast-bound fallback (AQE-planned join) is value-equal
    # to the broadcast plan on the same model frames
    mf2 = text.lm_bigram_model_frames(tgt, n_buckets=16, top_bigrams=64)
    c = sorted(map(tuple, text._lm_score_with_frames(
        docs, mf2["uni_df"], mf2["bi_df"], mf2["log_alpha"], 16,
        "text", "doc_id", broadcast_model=False).collect()))
    d = sorted(map(tuple, text.lm_score(docs, mf2).collect()))
    assert c == d


def test_lm_frames_scorer_plan_broadcasts_model(spark):
    """Frames-model scoring under the broadcast bound must plan THREE
    BroadcastHashJoins (bigram, backoff unigram, first-token unigram) and
    exactly ONE aggregate exchange (the per-doc re-aggregation) — the
    corpus side never shuffles to meet the model."""
    df = spark.createDataFrame(
        [(1, "a b c a b"), (2, "c c a")], "doc_id long, text string")
    mf = text.lm_bigram_model_frames(df, n_buckets=8, top_bigrams=4)
    plan = text.lm_score(df, mf)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 3, plan
    assert "SortMergeJoin" not in plan, plan


def test_lm_frames_guards(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b c a b")], "doc_id long, text string")
    mf = text.lm_bigram_model_frames(df, n_buckets=8, top_bigrams=4)
    # a frames model has no literal-map form — explicit 'map' is an error
    with pytest.raises(ValueError, match="frames-native"):
        text.lm_score(df, mf, strategy="map")
    # frames trainer bounds: long pair key, positive smoothing
    with pytest.raises(ValueError, match="n_buckets"):
        text.lm_bigram_model_frames(df, n_buckets=(1 << 30) + 1)
    with pytest.raises(ValueError, match="smoothing"):
        text.lm_bigram_model_frames(df, smoothing=0.0)
    # lm_nll(frames=True) end-to-end
    rows = text.lm_nll(df, df, n_buckets=8, top_bigrams=4,
                       frames=True).collect()
    assert rows[0]["n_tokens"] == 5


def test_lm_score_auto_routing_and_guards(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b c a b")], "doc_id long, text string")
    # beyond-map-cap model: trains fine, auto scores via join
    m = text.lm_bigram_model(df, n_buckets=2048, top_bigrams=4096)
    rows = text.lm_score(df, m).collect()  # auto -> join
    assert rows[0]["n_tokens"] == 5
    # explicit map on an over-cap model is an error, not silent fallback
    with pytest.raises(ValueError, match="literal-map caps"):
        text.lm_score(df, m, strategy="map")
    with pytest.raises(ValueError, match="strategy"):
        text.lm_score(df, m, strategy="nope")
    # lifted training caps still bounded
    with pytest.raises(ValueError, match="n_buckets"):
        text.lm_bigram_model(df, n_buckets=(1 << 20) + 1)
    with pytest.raises(ValueError, match="top_bigrams"):
        text.lm_bigram_model(df, top_bigrams=500_001)


def test_lm_score_join_preserves_duplicate_id_cardinality(spark):
    """strategy='auto' must not change output SHAPE when the model
    crosses the literal-map caps: the join/frames scorer re-aggregates
    on an internal per-row key, so duplicate doc ids emit one output
    row per input row, exactly like the map path."""
    docs = spark.createDataFrame(
        [(1, "a b c"), (1, "c b a"), (1, "a b c"), (2, None)],
        "doc_id long, text string")
    m = text.lm_bigram_model(docs, n_buckets=8, top_bigrams=8)
    a = sorted(map(tuple, text.lm_score(docs, m, strategy="map").collect()))
    b = sorted(map(tuple, text.lm_score(docs, m, strategy="join").collect()))
    assert len(b) == 4 and a == b, (a, b)
    mf = text.lm_bigram_model_frames(docs, n_buckets=8, top_bigrams=8)
    c = sorted(map(tuple, text.lm_score(docs, mf).collect()))
    assert a == c, (a, c)


def test_lm_frames_uncheckpointed_model_keeps_broadcast_plan(spark):
    """A checkpoint=False frames model records no n_bigrams; the scorer
    must size the broadcast decision on a bounded count of the ACTUAL
    bigram table, not the requested top_bigrams cap — a small model
    trained with a generous cap (10M) keeps its broadcast plan."""
    df = spark.createDataFrame([(1, "a b c a b"), (2, "c c a")],
                               "doc_id long, text string")
    mf = text.lm_bigram_model_frames(df, n_buckets=8,
                                     top_bigrams=10_000_000,
                                     checkpoint=False)
    assert mf["n_bigrams"] is None
    plan = (text.lm_score(df, mf)._jdf.queryExecution()
            .executedPlan().toString())
    # the three SCORER joins (bigram, backoff unigram, first-token
    # unigram) must broadcast; an uncheckpointed model also inlines its
    # TRAINING subplan (whose topb⋈prefix join may sort-merge), so no
    # blanket no-SMJ assertion here — test_lm_frames_scorer_plan_*
    # covers that for the checkpointed form
    assert plan.count("BroadcastHashJoin") == 3, plan


def test_lm_model_save_load_roundtrip(spark, tmp_path):
    """A trained LM persisted to disk scores IDENTICALLY after reload,
    for both trainer shapes (dict maps inlined in meta.json; frames
    tables as parquet the scorer joins lazily). A directory without a
    complete artifact (no meta.json) must refuse to load."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the the the"),
         (3, None), (4, ""), (5, "one")],
        "doc_id long, text string")
    tgt = spark.createDataFrame(
        [(10, "the cat sat"), (11, "on the mat the cat")],
        "doc_id long, text string")

    md = text.lm_bigram_model(tgt, n_buckets=16, top_bigrams=64)
    text.lm_model_save(md, str(tmp_path / "dict_model"))
    md2 = text.lm_model_load(spark, str(tmp_path / "dict_model"))
    assert md2["uni"] == md["uni"] and md2["bi"] == md["bi"]
    a = sorted(map(tuple, text.lm_score(docs, md).collect()))
    b = sorted(map(tuple, text.lm_score(docs, md2).collect()))
    assert a == b

    mf = text.lm_bigram_model_frames(tgt, n_buckets=16, top_bigrams=64)
    text.lm_model_save(mf, str(tmp_path / "frames_model"))
    mf2 = text.lm_model_load(spark, str(tmp_path / "frames_model"))
    assert mf2["frames"] and mf2["n_bigrams"] == mf["n_bigrams"]
    c = sorted(map(tuple, text.lm_score(docs, mf2).collect()))
    assert c == a  # frames == dict == reloaded-frames

    with pytest.raises(FileNotFoundError, match="meta.json"):
        text.lm_model_load(spark, str(tmp_path / "nowhere"))
