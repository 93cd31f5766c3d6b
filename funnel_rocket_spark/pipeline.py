"""One-command curation pipeline: a config-driven stage chain over the
curation operators — clean (C4/Gopher) → dedup → decontaminate → PII →
mix/resample → pack — with per-stage parquet checkpoints and resume.

``docs/pipeline.md`` walks the same chain by hand; this module is that
walkthrough as a product surface (``funnel-rocket-spark curate --config
pipeline.json``). Each stage materializes its output as a parquet
checkpoint under the config's ``workdir`` and records a chain hash in
``state.json``; a re-run (after a crash, a kill, or an added stage)
replays the longest prefix whose stage configs are unchanged from the
checkpoints and recomputes only from the first divergence — the same
persisted-prefix discipline as the incremental LSH band index.

Scale: the checkpoints ARE the scale story — every stage reads a parquet
scan and writes a parquet sink, so a 100 TB run is a sequence of bounded
Spark jobs where a mid-pipeline failure costs one stage, not the chain.

Config shape (JSON)::

    {
      "input":   {"path": ".../documents.parquet",
                  "id_col": "doc_id", "text_col": "text"},
      "workdir": "/data/curate_run1",
      "output":  {"path": "/data/release", "format": "jsonl", "shards": 8},
      "stages": [
        {"stage": "c4_clean", "min_words_per_line": 3,
         "require_terminal_punct": false},
        {"stage": "gopher_filter", "min_words": 20, "min_stopword_hits": 1},
        {"stage": "dedup_exact"},
        {"stage": "dedup_minhash", "threshold": 0.5},
        {"stage": "decontaminate", "eval_path": ".../eval.parquet", "n": 5},
        {"stage": "pii"},
        {"stage": "bpe_count", "learn": 24},
        {"stage": "mixture", "weights": {"en": 0.5, "de": 0.5},
         "strata_col": "lang", "total_tokens": 100000,
         "upsample": false, "token_col": "n_bpe_tokens"},
        {"stage": "split", "weights": {"train": 0.9, "val": 0.05,
                                       "test": 0.05}},
        {"stage": "pack", "block_size": 512, "shards": 8}
      ]
    }

Every stage key beyond ``"stage"`` is passed to the operator; unknown
stages fail fast with the list of known ones.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from funnel_rocket_spark.operators import dedup, sampling, text


def _stage_c4_clean(spark, df, cfg, ctx):
    params = {k: v for k, v in cfg.items() if k != "stage"}
    if "blacklist" in params:
        params["blacklist"] = tuple(params["blacklist"])
    cleaned = text.c4_line_filter(df, ctx["text_col"], ctx["id_col"],
                                  **params)
    return (df.drop(ctx["text_col"])
            .join(cleaned.select(ctx["id_col"],
                                 F.col("clean_text").alias(ctx["text_col"])),
                  ctx["id_col"]))


def _stage_gopher_filter(spark, df, cfg, ctx):
    params = {k: v for k, v in cfg.items() if k != "stage"}
    passing = (text.gopher_quality_filter(df, ctx["text_col"],
                                          ctx["id_col"], **params)
               .filter("passes").select(ctx["id_col"]))
    return df.join(passing, ctx["id_col"], "left_semi")


def _stage_dedup_exact(spark, df, cfg, ctx):
    groups = dedup.exact_duplicates(df, ctx["text_col"], ctx["id_col"])
    hashed = df.withColumn(
        "__h", F.md5(F.col(ctx["text_col"]).cast("binary")))
    keep = F.broadcast if cfg.get("broadcast", False) else (lambda x: x)
    survivors = keep(groups.select(F.col("content_hash").alias("__sh"),
                                   F.col("keep_id").alias("__keep_id")))
    # eqNullSafe: exact_duplicates groups null-text docs under the null
    # digest (md5(null) = null) and picks a keep_id for them too — a
    # plain equi-join would never match the null key, so every null-text
    # duplicate would silently survive.
    return (hashed.join(survivors,
                        hashed["__h"].eqNullSafe(survivors["__sh"]), "left")
            .where(F.col("__keep_id").isNull()
                   | (F.col(ctx["id_col"]) == F.col("__keep_id")))
            .drop("__h", "__sh", "__keep_id"))


def _stage_dedup_minhash(spark, df, cfg, ctx):
    params = {k: v for k, v in cfg.items() if k != "stage"}
    pairs = dedup.minhash_lsh_pairs(df, ctx["text_col"], ctx["id_col"],
                                    **params)
    return dedup.apply_dedup(df, pairs, ctx["id_col"])


def _stage_dedup_semantic(spark, df, cfg, ctx):
    """SemDeDup stage (Abbas et al. 2023): drop docs whose EMBEDDINGS are
    near-identical, catching paraphrase-level duplicates the lexical
    minhash stage can't see. Embeddings are a side input
    (``embeddings_path`` parquet, ``vec_id_col`` matching the chain's id
    column) — the standard deployment shape where an embedding job runs
    upstream of curation. The k-means coarse quantizer trains on the
    FULL embeddings side input (not the chain-filtered subset): like
    the lm_gate model, the centers then depend only on the side input
    and the params, so they persist under ``workdir/models/kmeans_<key>``
    and survive both resume and upstream-stage changes (the r9-rung
    retrain-per-run cost). Cells also stay put when upstream filters
    move, which keeps the candidate structure stable run-over-run.
    Pair comparison still runs on LIVE vectors only (semi-join first):
    a pair against an upstream-dropped doc must never decide a
    survivor. Docs WITHOUT an embedding row pass through ungated —
    absence of a vector must not silently drop data. Survivor policy
    is min-id per duplicate cluster, like every dedup stage."""
    from funnel_rocket_spark.operators import similarity

    emb = spark.read.parquet(cfg["embeddings_path"])
    vec_id = cfg.get("vec_id_col", "vec_id")
    vec_col = cfg.get("vec_col", "embedding")
    live = emb.join(
        df.select(F.col(ctx["id_col"]).alias(vec_id)), vec_id, "left_semi")
    # pass the remaining keys through verbatim so a typo'd key fails fast
    # (TypeError) like every other stage, instead of silently running
    # with defaults while still invalidating the chain hash
    params = {k: v for k, v in cfg.items()
              if k not in ("stage", "embeddings_path", "vec_id_col",
                           "vec_col", "train_on")}
    # BEHAVIOR CHANGE (r10, docs/pipeline.md): the quantizer trains on
    # the FULL side input by default. "train_on": "live" restores the
    # pre-r10 chain-filtered training set for operators pinning
    # run-over-run outputs; live centers depend on chain state, so that
    # mode never reads or writes the kmeans_<key> artifact cache.
    train_on = cfg.get("train_on", "side_input")
    if train_on not in ("side_input", "live"):
        raise ValueError(f"dedup_semantic train_on={train_on!r} "
                         "(side_input|live)")
    # "persist_index": true (r11) upgrades the artifact from centers-only
    # to the FULL persisted IVF index (cell-partitioned side-input
    # assignments via similarity.save_ivf_index): resumed runs then skip
    # the per-run assignment GEMM too, not just the training rounds —
    # the pair stage starts from a semi-join against the stored cells.
    # Opt-in because the index is a full copy of the embeddings side
    # input under workdir/models. Assignment is per-vector (independent
    # of the rest of the corpus), so restricting the stored full-corpus
    # assignment to chain-live ids is byte-identical to assigning the
    # live subset with the same centers (test-pinned).
    persist_index = bool(cfg.get("persist_index", False))
    params.pop("persist_index", None)
    if persist_index and train_on == "live":
        raise ValueError(
            "dedup_semantic persist_index requires train_on=side_input: "
            "live assignments depend on chain state and must not persist")
    centers = None
    assigned_live = None
    cache_path = None
    index_path = None
    if ctx.get("workdir") and train_on == "side_input":
        key_payload = {
            "emb": _input_fingerprint(str(cfg["embeddings_path"])),
            "vec_id": vec_id, "vec_col": vec_col,
            "k": params.get("k", 8), "rounds": params.get("rounds", 2)}
        key = hashlib.md5(
            json.dumps(key_payload, sort_keys=True).encode()).hexdigest()
        cache_path = os.path.join(ctx["workdir"], "models",
                                  f"kmeans_{key}.json")
        index_path = os.path.join(ctx["workdir"], "models", f"ivf_{key}")
        # resume=False must bypass MODEL caches too, not only chain
        # checkpoints: a remote (non-fingerprintable) embeddings path
        # falls back to a bare-path key, and --no-resume is the
        # documented escape hatch for an overwritten remote input
        if ctx.get("resume", True):
            if persist_index and os.path.isfile(
                    os.path.join(index_path, "centers.json")):
                full_assigned, centers = similarity.load_ivf_index(
                    spark, index_path)
                assigned_live = (
                    full_assigned
                    .withColumnRenamed("__cell", "cluster")
                    .join(df.select(F.col(ctx["id_col"]).alias(vec_id)),
                          vec_id, "left_semi"))
            elif os.path.isfile(cache_path):
                with open(cache_path) as fh:
                    centers = json.load(fh)["centers"]
    if centers is None:
        train = emb if train_on == "side_input" else live
        full_assigned, centers = similarity.kmeans_lloyd(
            train, k=params.get("k", 8), rounds=params.get("rounds", 2),
            id_col=vec_id, vec_col=vec_col)
        if index_path and persist_index:
            similarity.save_ivf_index(
                full_assigned.withColumnRenamed("cluster", "__cell")
                .select(vec_id, vec_col, "__cell"),
                centers, index_path)
            loaded, _ = similarity.load_ivf_index(spark, index_path)
            assigned_live = (
                loaded.withColumnRenamed("__cell", "cluster")
                .join(df.select(F.col(ctx["id_col"]).alias(vec_id)),
                      vec_id, "left_semi"))
        elif cache_path:
            os.makedirs(os.path.dirname(cache_path), exist_ok=True)
            with open(cache_path, "w") as fh:
                json.dump({"centers": centers, "key": key_payload}, fh)
    if assigned_live is not None:
        pairs = similarity.semantic_dedup_pairs(
            live, id_col=vec_id, vec_col=vec_col, centers=centers,
            assigned=assigned_live, **params)
    else:
        pairs = similarity.semantic_dedup_pairs(
            live, id_col=vec_id, vec_col=vec_col, centers=centers,
            **params)
    return dedup.apply_dedup(df, pairs, ctx["id_col"])


def _stage_retrieval(spark, df, cfg, ctx):
    """Nearest-benchmark-neighbors REPORTING stage (r12): for each
    benchmark query vector (``queries_path`` parquet), retrieve its
    ``top_k`` nearest LIVE chain documents by cosine over the persisted
    IVF index, and write the neighbor table to
    ``workdir/reports/<report_name>.parquet``. The chain frame passes
    through UNCHANGED — this is the "which training docs sit closest to
    my benchmark" audit (contamination forensics, nearest-neighbor
    attribution), not a filter.

    The index artifact is the SAME ``workdir/models/ivf_<key>`` the
    ``dedup_semantic persist_index:true`` stage writes (identical key
    payload: embeddings fingerprint + vec/id columns + k/rounds), so a
    pipeline running both stages builds the index ONCE and both resume
    from it; assignment is per-vector, so restricting the stored
    full-corpus assignments to chain-live ids is exactly assigning the
    live subset (the dedup_semantic test pins this). Search runs with
    ``prune_cells=True`` — on the cell-partitioned layout only probed
    cells' files are read at all (parquet partition pruning; the 100 TB
    property). Resume semantics: a green chain checkpoint skips the
    stage entirely (same chain ⇒ same report, already on disk); a
    recompute reuses the index artifact and pays only the pruned
    search."""
    from funnel_rocket_spark.operators import similarity

    emb = spark.read.parquet(cfg["embeddings_path"])
    vec_id = cfg.get("vec_id_col", "vec_id")
    vec_col = cfg.get("vec_col", "embedding")
    top_k = int(cfg.get("top_k", 10))
    n_probe = int(cfg.get("n_probe", 4))
    k = int(cfg.get("k", 8))
    rounds = int(cfg.get("rounds", 2))
    queries = spark.read.parquet(cfg["queries_path"])

    full_assigned = centers = None
    index_path = None
    if ctx.get("workdir"):
        key_payload = {
            "emb": _input_fingerprint(str(cfg["embeddings_path"])),
            "vec_id": vec_id, "vec_col": vec_col,
            "k": k, "rounds": rounds}
        key = hashlib.md5(
            json.dumps(key_payload, sort_keys=True).encode()).hexdigest()
        index_path = os.path.join(ctx["workdir"], "models", f"ivf_{key}")
        if ctx.get("resume", True) and os.path.isfile(
                os.path.join(index_path, "centers.json")):
            full_assigned, centers = similarity.load_ivf_index(
                spark, index_path)
    if centers is None:
        assigned, centers = similarity.kmeans_lloyd(
            emb, k=k, rounds=rounds, id_col=vec_id, vec_col=vec_col)
        full_assigned = (assigned.withColumnRenamed("cluster", "__cell")
                         .select(vec_id, vec_col, "__cell"))
        if index_path:
            similarity.save_ivf_index(full_assigned, centers, index_path)
            full_assigned, centers = similarity.load_ivf_index(
                spark, index_path)
    live = full_assigned.join(
        df.select(F.col(ctx["id_col"]).alias(vec_id)), vec_id, "left_semi")
    hits = similarity.ivf_search(
        live, centers, queries, k=top_k, n_probe=n_probe,
        id_col=vec_id, vec_col=vec_col, prune_cells=True)
    report_dir = os.path.join(ctx["workdir"] or ".", "reports")
    os.makedirs(report_dir, exist_ok=True)
    out = os.path.join(report_dir,
                       f"{cfg.get('report_name', 'retrieval')}.parquet")
    hits.write.mode("overwrite").parquet(out)
    return df


def _stage_decontaminate(spark, df, cfg, ctx):
    evalset = spark.read.parquet(cfg["eval_path"])
    params = {k: v for k, v in cfg.items()
              if k not in ("stage", "eval_path")}
    dirty = dedup.ngram_contamination(
        df, evalset, ctx["text_col"], ctx["id_col"],
        **params).select(ctx["id_col"])
    return df.join(dirty, ctx["id_col"], "left_anti")


def _stage_decontaminate_semantic(spark, df, cfg, ctx):
    """Semantic decontamination: drop docs whose EMBEDDING is within
    ``threshold`` cosine of any eval-set embedding — catches the
    paraphrased benchmark leakage the n-gram ``decontaminate`` stage
    can't see (no shared 5-gram). Embeddings are side inputs
    (``embeddings_path`` for the corpus keyed by the chain's id column,
    ``eval_embeddings_path`` for the benchmark suite); docs without an
    embedding row pass through ungated, like ``dedup_semantic``.

    The hit set is computed over the FULL embeddings side input and
    persisted under ``workdir/models/contam_<key>`` (keyed by both
    side-input fingerprints + params): contamination of a vector
    against a fixed eval set is a pure function of the two side inputs,
    so restricting the anti-join to chain-live docs afterwards returns
    byte-identical output to scoring the live subset — while the
    expensive corpus×eval GEMM runs once per (corpus, eval, params),
    not once per chain run (the r9-rung retrain-per-run cost)."""
    from funnel_rocket_spark.operators import similarity

    emb = spark.read.parquet(cfg["embeddings_path"])
    evalset = spark.read.parquet(cfg["eval_embeddings_path"])
    vec_id = cfg.get("vec_id_col", "vec_id")
    vec_col = cfg.get("vec_col", "embedding")
    params = {k: v for k, v in cfg.items()
              if k not in ("stage", "embeddings_path",
                           "eval_embeddings_path", "vec_id_col", "vec_col")}
    cache_path = None
    dirty = None
    if ctx.get("workdir"):
        key_payload = {
            "emb": _input_fingerprint(str(cfg["embeddings_path"])),
            "eval": _input_fingerprint(str(cfg["eval_embeddings_path"])),
            "vec_id": vec_id, "vec_col": vec_col,
            "params": {k: params[k] for k in sorted(params)}}
        key = hashlib.md5(
            json.dumps(key_payload, sort_keys=True).encode()).hexdigest()
        cache_path = os.path.join(ctx["workdir"], "models",
                                  f"contam_{key}.parquet")
        # see _stage_dedup_semantic: resume=False bypasses model caches
        if ctx.get("resume", True) and os.path.isfile(
                os.path.join(cache_path, "_SUCCESS")):
            dirty = spark.read.parquet(cache_path)
    if dirty is None:
        hits = similarity.semantic_contamination(
            emb, evalset, id_col=vec_id, vec_col=vec_col, **params)
        # stored under the vec id name: the artifact is keyed by the side
        # inputs alone, so a chain with a different id_col can reuse it
        dirty = hits.select(vec_id).distinct()
        if cache_path:
            dirty.write.mode("overwrite").parquet(cache_path)
            dirty = spark.read.parquet(cache_path)
    return df.join(
        dirty.select(F.col(vec_id).alias(ctx["id_col"])),
        ctx["id_col"], "left_anti")


def _stage_pii(spark, df, cfg, ctx):
    red = text.redact_pii(df, ctx["text_col"], ctx["id_col"])
    return (df.drop(ctx["text_col"])
            .join(red.select(ctx["id_col"],
                             F.col("redacted").alias(ctx["text_col"]),
                             "n_redactions"),
                  ctx["id_col"]))


def _stage_mixture(spark, df, cfg, ctx):
    fn = (sampling.mixture_upsample if cfg.get("upsample")
          else sampling.mixture_sample)
    return fn(df, cfg["weights"], cfg["strata_col"], cfg["total_tokens"],
              text_col=ctx["text_col"], id_col=ctx["id_col"],
              salt=cfg.get("salt", ""), token_col=cfg.get("token_col"))


def _stage_dsir(spark, df, cfg, ctx):
    target = spark.read.parquet(cfg["target_path"])
    return sampling.dsir_resample(
        df, target, cfg["n"], text_col=ctx["text_col"],
        id_col=ctx["id_col"], n_buckets=cfg.get("n_buckets", 1024),
        smoothing=cfg.get("smoothing", 1.0),
        salt=cfg.get("salt", "dsir"))


def _stage_lm_gate(spark, df, cfg, ctx):
    """CCNet-style LM quality gate (Wenzek et al. 2020): train a hashed
    bigram LM on the target corpus at ``target_path``, score every doc's
    avg negative log-likelihood, keep docs that read like the target —
    either below an absolute ``max_avg_nll`` or the lowest-nll
    ``keep_frac`` of the corpus (threshold = one approxQuantile on the
    scored frame, the CCNet head/middle/tail cut). ``"frames": true``
    trains via the frames-native trainer (model tables stay on the
    cluster — required for CCNet-grade n_buckets/top_bigrams past the
    driver collect bounds).

    The trained model is an ARTIFACT, not a stage computation: it
    depends only on the target corpus and the LM params, never on the
    chain state flowing through ``df`` — so it is persisted under
    ``workdir/models/lm_<key>`` keyed by (target data fingerprint,
    text_col, params) and reloaded on any re-run where that key still
    holds, even when an UPSTREAM stage change forces this stage itself
    to recompute (the chain-hash resume can't help there; this can).
    Overwriting the target parquet in place changes the fingerprint and
    retrains, same contract as the chain hash's side-input rule."""
    from funnel_rocket_spark.operators.text import (
        lm_bigram_model, lm_bigram_model_frames, lm_model_load,
        lm_model_save, lm_score)

    frames = bool(cfg.get("frames", False))
    n_buckets = cfg.get("n_buckets", 256)
    top_bigrams = cfg.get("top_bigrams", 1024)
    model = None
    cache_dir = None
    if ctx.get("workdir"):
        key_payload = {
            "target": _input_fingerprint(str(cfg["target_path"])),
            "text_col": ctx["text_col"], "n_buckets": n_buckets,
            "top_bigrams": top_bigrams, "frames": frames}
        key = hashlib.md5(
            json.dumps(key_payload, sort_keys=True).encode()).hexdigest()
        cache_dir = os.path.join(ctx["workdir"], "models", f"lm_{key}")
        # see _stage_dedup_semantic: resume=False bypasses model caches
        if ctx.get("resume", True) and os.path.isfile(
                os.path.join(cache_dir, "meta.json")):
            model = lm_model_load(spark, cache_dir)
    if model is None:
        target = spark.read.parquet(cfg["target_path"])
        trainer = lm_bigram_model_frames if frames else lm_bigram_model
        model = trainer(target, text_col=ctx["text_col"],
                        n_buckets=n_buckets, top_bigrams=top_bigrams)
        if cache_dir:
            lm_model_save(model, cache_dir)
    scored = lm_score(df, model, text_col=ctx["text_col"],
                      id_col=ctx["id_col"],
                      strategy=cfg.get("strategy", "auto"))
    if "max_avg_nll" in cfg:
        cut = float(cfg["max_avg_nll"])
        keep = scored.where(F.col("avg_nll") <= cut).select(ctx["id_col"])
        return df.join(keep, ctx["id_col"], "left_semi")
    if "keep_frac" not in cfg:
        raise ValueError("lm_gate stage needs 'max_avg_nll' or 'keep_frac'")
    # keep_frac consumes the scored frame TWICE (quantile, then the keep
    # filter) — persist it, or the most expensive plan of the pipeline
    # (corpus scan + LM scoring) executes twice
    from funnel_rocket_spark.operators.dedup import bounded_persist

    scored = bounded_persist(scored)
    qt = scored.approxQuantile(
        "avg_nll", [float(cfg["keep_frac"])], 0.001)
    if not qt:  # empty corpus: nothing to rank, keep nothing
        return df.limit(0)
    cut = qt[0]
    keep = scored.where(F.col("avg_nll") <= cut).select(ctx["id_col"])
    return df.join(keep, ctx["id_col"], "left_semi")


def _stage_classifier_gate(spark, df, cfg, ctx):
    """Quality gate with a linear classifier, two forms. ``weights``:
    offline-trained token weights (fasttext/logreg export) scored with
    the occurrence-weighted, length-normalized
    ``classifier_score_weights`` and kept when strictly above
    ``threshold`` (strict, so zero-evidence docs at exactly 0.5 drop at
    the default). ``train_label_token`` + ``vocab``: train a perceptron
    IN-ENGINE on the current corpus state (label = doc contains that
    token — the docs/pipeline.md step-1 pattern) and gate with
    ``perceptron_predict``, the model's OWN decision function (binary
    presence + bias, margin > 0) — on a corpus training converged on,
    the gate reproduces the labels exactly."""
    if "weights" in cfg:
        scored = text.classifier_score_weights(
            df, dict(cfg["weights"]), text_col=ctx["text_col"],
            id_col=ctx["id_col"])
        keep = (scored.where(F.col("clf_score")
                             > float(cfg.get("threshold", 0.5)))
                .select(ctx["id_col"]))
    elif "train_label_token" in cfg:
        label = F.array_contains(
            F.split(F.lower(F.col(ctx["text_col"])), r"\s+"),
            cfg["train_label_token"])
        weights, _ = text.train_classifier_perceptron(
            df, label, list(cfg["vocab"]), text_col=ctx["text_col"],
            id_col=ctx["id_col"],
            iterations=cfg.get("iterations", 3))
        keep = (text.perceptron_predict(df, weights,
                                        text_col=ctx["text_col"],
                                        id_col=ctx["id_col"])
                .where(F.col("label_pred") == 1).select(ctx["id_col"]))
    else:
        raise ValueError(
            "classifier_gate stage needs 'weights' or 'train_label_token'")
    return df.join(keep, ctx["id_col"], "left_semi")


def _stage_bpe_count(spark, df, cfg, ctx):
    """Attach exact BPE token counts (``n_bpe_tokens``) so a later
    ``mixture`` stage with ``"token_col": "n_bpe_tokens"`` budgets on
    TRUE tokenizer counts. ``merges`` supplies a pinned table
    ([[left, right], ...]); ``learn`` trains one in-engine on the
    current (already cleaned/deduped) corpus state instead. With
    ``keep_bpe_text`` the encoded stream column is kept too."""
    if "merges" in cfg:
        merges = [tuple(p) for p in cfg["merges"]]
    elif "learn" in cfg:
        merges = text.learn_bpe(df, int(cfg["learn"]),
                                text_col=ctx["text_col"],
                                min_count=cfg.get("min_count", 2))
    else:
        raise ValueError("bpe_count stage needs 'merges' or 'learn'")
    enc = text.bpe_tokenize(df, merges, ctx["text_col"], ctx["id_col"],
                            strategy=cfg.get("strategy", "auto"))
    cols = [ctx["id_col"], "n_bpe_tokens"]
    if cfg.get("keep_bpe_text"):
        cols.append("bpe_text")
    return df.join(enc.select(*cols), ctx["id_col"])


def _stage_split(spark, df, cfg, ctx):
    return sampling.assign_split(df, cfg["weights"], id_col=ctx["id_col"],
                                 salt=cfg.get("salt", ""),
                                 out_col=cfg.get("out_col", "split"))


def _stage_pack(spark, df, cfg, ctx):
    """``"pretokenized": true`` packs on the BPE token stream a prior
    ``bpe_count`` stage kept via ``keep_bpe_text`` (split on single
    spaces — bpe_text is space-joined by construction), completing the
    exact-token-count chain bpe_count → mixture(token_col) → pack.
    Default remains whitespace words of the text column."""
    pre = None
    if cfg.get("pretokenized"):
        if "bpe_text" not in df.columns:
            raise ValueError(
                "pack stage with 'pretokenized' needs a bpe_text column — "
                "add a bpe_count stage with \"keep_bpe_text\": true first")
        df = df.withColumn(
            "__pre_toks",
            F.filter(F.split(F.coalesce(F.col("bpe_text"), F.lit("")), " "),
                     lambda t: t != F.lit("")))
        pre = "__pre_toks"
    return text.pack_token_blocks(
        df, ctx["text_col"], ctx["id_col"],
        block_size=cfg.get("block_size", 512),
        shards=cfg.get("shards", 8),
        pretokenized_col=pre)


STAGES = {
    "c4_clean": _stage_c4_clean,
    "gopher_filter": _stage_gopher_filter,
    "dedup_exact": _stage_dedup_exact,
    "dedup_minhash": _stage_dedup_minhash,
    "dedup_semantic": _stage_dedup_semantic,
    "retrieval": _stage_retrieval,
    "decontaminate": _stage_decontaminate,
    "decontaminate_semantic": _stage_decontaminate_semantic,
    "pii": _stage_pii,
    "lm_gate": _stage_lm_gate,
    "classifier_gate": _stage_classifier_gate,
    "bpe_count": _stage_bpe_count,
    "mixture": _stage_mixture,
    "dsir": _stage_dsir,
    "split": _stage_split,
    "pack": _stage_pack,
}


def _input_fingerprint(path: str) -> str:
    """Cheap driver-side fingerprint of the input DATA, not just its
    path: sorted (relative path, size, mtime_ns) of every regular file
    under ``path``. Overwriting the input parquet in place therefore
    invalidates every checkpoint — without this, a re-run would resume
    from checkpoints computed on the OLD data and report success.
    Non-local inputs (object-store URIs, paths not visible from the
    driver) fall back to the bare path string — documented as "changed
    remote input requires --no-resume or a fresh workdir". resume=False
    bypasses chain checkpoints AND the workdir/models artifact caches
    (kmeans_/contam_/lm_ — see ctx["resume"] in run_pipeline), so that
    escape hatch is real for both cache layers."""
    if not os.path.exists(path):
        return f"path:{path}"
    entries = []
    if os.path.isfile(path):
        st = os.stat(path)
        entries.append(("", st.st_size, st.st_mtime_ns))
    else:
        for root, _dirs, files in os.walk(path):
            for f in files:
                fp = os.path.join(root, f)
                try:
                    st = os.stat(fp)
                except OSError:
                    continue
                entries.append((os.path.relpath(fp, path),
                                st.st_size, st.st_mtime_ns))
    entries.sort()
    return "files:" + hashlib.md5(
        json.dumps(entries).encode()).hexdigest()


# stage-config keys that name a SECOND dataset read from disk: their
# file contents must invalidate the stage exactly like the main input's
_SIDE_INPUT_KEYS = ("eval_path", "target_path", "embeddings_path",
                    "eval_embeddings_path")


def _chain_hashes(config: dict) -> list[str]:
    """Per-stage chain hash: h_i = md5(h_{i-1} || canonical(stage_i) ||
    side-input fingerprints || canonical(input) || fingerprint(input
    data)). A change to any stage, the input block, the input FILES
    (size/mtime), or a stage's SIDE dataset (decontaminate eval_path,
    dsir/lm_gate target_path) invalidates that checkpoint and everything
    after it, never before — overwriting eval.parquet in place must not
    resume a decontaminate checkpoint computed against the old eval set."""
    inp = config.get("input", {})
    seed = {"input": inp,
            "data": _input_fingerprint(inp.get("path", ""))}
    h = hashlib.md5(json.dumps(seed, sort_keys=True).encode())
    out = []
    for st in config.get("stages", []):
        payload = dict(st)
        for k in _SIDE_INPUT_KEYS:
            if k in st:
                payload[f"__data_{k}"] = _input_fingerprint(str(st[k]))
        h = hashlib.md5(
            h.hexdigest().encode()
            + json.dumps(payload, sort_keys=True).encode())
        out.append(h.hexdigest())
    return out


def _load_state(workdir: str) -> dict:
    path = os.path.join(workdir, "state.json")
    if os.path.isfile(path):
        with open(path) as fh:
            return json.load(fh)
    return {"stages": []}


def _save_state(workdir: str, state: dict) -> None:
    path = os.path.join(workdir, "state.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(state, fh, indent=1, sort_keys=True)
    os.replace(tmp, path)  # atomic: a crash mid-save can't corrupt resume


def _checkpoint_ok(workdir: str, state: dict, i: int, want_hash: str) -> bool:
    entries = state.get("stages", [])
    if i >= len(entries):
        return False
    e = entries[i]
    return (e.get("hash") == want_hash and e.get("checkpoint")
            and os.path.isdir(e["checkpoint"])
            and os.path.isfile(os.path.join(e["checkpoint"], "_SUCCESS")))


def run_pipeline(spark: SparkSession, config: dict,
                 resume: bool = True) -> dict:
    """Execute the configured stage chain; returns the run report
    (per-stage rows in/out, resumed-vs-computed, output location)."""
    inp = config["input"]
    workdir = config["workdir"]
    ctx = {"id_col": inp.get("id_col", "doc_id"),
           "text_col": inp.get("text_col", "text"),
           "workdir": workdir,
           # stages honor this for their MODEL-artifact caches
           # (kmeans_/contam_/lm_ under workdir/models): resume=False
           # means "trust nothing on disk", including artifacts keyed
           # by a bare-path fingerprint of a remote side input
           "resume": resume}
    os.makedirs(workdir, exist_ok=True)
    stage_cfgs = config.get("stages", [])
    for st in stage_cfgs:
        if st.get("stage") not in STAGES:
            raise ValueError(
                f"unknown stage {st.get('stage')!r}; known: "
                f"{sorted(STAGES)}")
    hashes = _chain_hashes(config)
    state = _load_state(workdir) if resume else {"stages": []}

    df = spark.read.parquet(inp["path"])
    rows_in = df.count()
    report = {"input": inp["path"], "rows_in": rows_in, "stages": []}
    new_entries: list[dict] = []
    dirty = False  # once a stage recomputes, its successors' checkpoints
    # describe a stale input and must be recomputed too — resume is only
    # valid on an UNBROKEN prefix of green checkpoints
    for i, (st, h) in enumerate(zip(stage_cfgs, hashes)):
        name = st["stage"]
        ckpt = os.path.join(workdir, f"stage_{i:02d}_{name}.parquet")
        if resume and not dirty and _checkpoint_ok(workdir, state, i, h):
            entry = dict(state["stages"][i])
            entry["resumed"] = True
            df = spark.read.parquet(entry["checkpoint"])
            new_entries.append(entry)
            report["stages"].append(
                {"stage": name, "rows_out": entry.get("rows_out"),
                 "resumed": True})
            continue
        dirty = True
        t0 = time.monotonic()
        df = STAGES[name](spark, df, st, ctx)
        df.write.mode("overwrite").parquet(ckpt)
        df = spark.read.parquet(ckpt)  # downstream reads the checkpoint
        rows_out = df.count()
        entry = {"stage": name, "hash": h, "checkpoint": ckpt,
                 "rows_out": rows_out,
                 "seconds": round(time.monotonic() - t0, 3)}
        new_entries.append(entry)
        # persist state after EVERY stage so a kill resumes from here
        _save_state(workdir, {"stages": new_entries})
        report["stages"].append(
            {"stage": name, "rows_out": rows_out, "resumed": False,
             "seconds": entry["seconds"]})
    _save_state(workdir, {"stages": new_entries})

    out = config.get("output")
    if out:
        fmt = out.get("format", "jsonl")
        shards = int(out.get("shards", 8))
        path = out["path"]
        if fmt == "jsonl":
            (df.repartition(shards)
             .write.mode("overwrite").json(path))
        elif fmt == "parquet":
            (df.repartition(shards)
             .write.mode("overwrite").parquet(path))
        else:
            raise ValueError(f"unknown output format {fmt!r} "
                             "(jsonl|parquet)")
        report["output"] = {"path": path, "format": fmt, "shards": shards}
    report["rows_out"] = report["stages"][-1]["rows_out"] \
        if report["stages"] else rows_in
    return report
