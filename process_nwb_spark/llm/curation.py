"""End-to-end training-data curation: the composition the individual
registry operators exist for, as ONE lazy DataFrame program.

    documents -> quality gate -> language gate -> exact-dedup keep-min ->
    deterministic embedding -> sign-LSH bucket assignment

Every stage is a narrow projection or one hash-agg; Catalyst fuses the
gates into the scan. The output is the curated corpus with its dedup key,
embedding, and ANN bucket — ready to write partitioned by bucket so
similarity probes prune to one partition.

The embedder is a deterministic md5-based fake (no model runtimes in this
container): 16 dims, dim i = byte i of md5(text) scaled to [-1, 1). Like
the multimodal codecs (llm/multimodal.py), swapping in a real encoder
(e.g. an Arrow-batched ONNX pandas_udf) changes no plumbing.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EMB_DIM = 16


def fake_embedding(col="text"):
    """ARRAY<DOUBLE> of _EMB_DIM md5-derived values in [-1, 1) — pure JVM
    (md5 + conv + transform), deterministic across engines."""
    h = F.md5(col)
    return F.transform(
        F.sequence(F.lit(0), F.lit(_EMB_DIM - 1)),
        lambda i: F.conv(F.substring(h, i * 2 + 1, 2), 16, 10)
        .cast("double") / 128.0 - 1.0)


def sign_bucket(vec_col, n_bits: int = 4):
    """Alternating-sign-plane LSH bucket of an array column (same family
    as relational/embed_lsh.py, smaller key).

    The planes are _EMB_DIM-wide literals; a vector of any other length
    would zip_with NULL-padding into a NULL dot product and silently
    collapse every affected bit to 0 (all rows toward one bucket, ANN
    pruning destroyed) — so the width is asserted in-plan and a mismatch
    fails the job loudly instead. The assert wraps the FINAL key once
    (not each per-bit dot product), so the size check appears exactly one
    time in the plan instead of n_bits times."""
    key = F.lit(0)
    for b in range(n_bits):
        dot = F.aggregate(
            F.zip_with(vec_col,
                       F.array(*[F.lit(1.0 if (i >> b) & 1 else -1.0)
                                 for i in range(_EMB_DIM)]),
                       lambda x, c: x * c),
            F.lit(0.0), lambda acc, x: acc + x)
        key = key + F.when(dot >= 0, F.lit(1 << b)).otherwise(0)
    # a short vector NULL-pads dots to NULL -> bits fall to 0; the single
    # guard here turns that silent collapse into a loud in-plan failure
    return F.when(F.size(vec_col) == _EMB_DIM, key).otherwise(
        F.raise_error(F.concat(
            F.lit(f"sign_bucket: expected {_EMB_DIM}-dim vector, got "),
            F.size(vec_col).cast("string"), F.lit(" dims"))).cast("int"))


def curate(documents: DataFrame,
           min_tokens: int = 20, max_chars_per_token: float = 12.0,
           max_stopword_ratio: float = 0.9,
           langs: tuple = ("en",)) -> DataFrame:
    """The curation program. Returns (doc_id, lang, source, n_tokens,
    fp, embedding, bucket) for kept documents."""
    n_tok = F.regexp_count("text", F.lit(r"\w+"))
    stop_ratio = (F.regexp_count(F.lower("text"),
                                 F.lit(r"\b(the|a|an|and|or|of|to|in)\b"))
                  .cast("double") / F.greatest(n_tok, F.lit(1)))
    cpt = F.length("text").cast("double") / F.greatest(n_tok, F.lit(1))
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))

    gated = (documents
             .withColumn("n_tokens", n_tok)
             .filter((F.col("n_tokens") >= min_tokens)
                     & (cpt <= max_chars_per_token)
                     & (stop_ratio <= max_stopword_ratio)
                     & F.col("lang").isin(*langs))
             .withColumn("fp", fp))

    # exact dedup: keep the min doc_id per fingerprint (deterministic)
    from pyspark.sql.window import Window

    w = Window.partitionBy("fp")
    deduped = (gated.withColumn("_keep", F.min("doc_id").over(w))
               .filter(F.col("doc_id") == F.col("_keep"))
               .drop("_keep"))

    emb = fake_embedding()
    return (deduped
            .withColumn("embedding", emb)
            .withColumn("bucket", sign_bucket(F.col("embedding")))
            .select("doc_id", "lang", "source", "n_tokens", "fp",
                    "embedding", "bucket"))


def assemble(documents: DataFrame, capacity: int = 2048,
             **curate_kwargs) -> DataFrame:
    """Corpus assembly on top of `curate`: the full training-data program

        curate (gates + dedup + embed + bucket)
          -> deterministic md5 train/valid/test split
          -> keep train
          -> pack into `capacity`-token context windows per source

    as one lazy DataFrame plan. Shuffle budget: curate's dedup window (1)
    + the per-source packing window (1) — the split and gates are narrow.
    Returns (doc_id, lang, source, n_tokens, bucket, split, pack_id).
    """
    from pyspark.sql.window import Window

    from ..relational.dataprep import _with_split

    train = _with_split(curate(documents, **curate_kwargs)) \
        .filter(F.col("split") == "train")
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return train.select(
        "doc_id", "lang", "source", "n_tokens", "bucket", "split",
        F.floor(cum_before / capacity).cast("long").alias("pack_id"))


def assemble_v2(documents: DataFrame, capacity: int = 2048,
                max_dup_word_frac: float = 0.7,
                min_avg_log2_prob: float = -12.0,
                **curate_kwargs) -> DataFrame:
    """The extended corpus program — every 2024-era pipeline stage in one
    lazy plan:

        curate (quality/lang gates + exact dedup + embed + bucket)
          -> repetition gate (Gopher dup-word fraction)
          -> self-trained bigram-LM score gate (CCNet shape)
          -> PII redaction of the text that ships
          -> deterministic train split + per-source context packing

    Shuffle budget over the big table: curate's dedup window, the LM
    re-aggregation keyed by doc, and the packing window — THREE. The
    bigram model builds from two vocabulary-sized aggregations that
    broadcast back; every gate is a narrow projection. Returns
    (doc_id, lang, source, n_tokens, bucket, split, pack_id, clean_text,
    lm_score).
    """
    from pyspark.sql.window import Window

    from ..relational.dataprep import _with_split

    kept = curate(documents, **curate_kwargs)
    # re-attach text for the text-level stages (curate prunes it)
    kept = kept.join(documents.select("doc_id", "text"), "doc_id")

    w_arr = F.split("text", " ")
    dup_frac = (1 - F.size(F.array_distinct(w_arr)).cast("double")
                / F.size(w_arr))
    kept = kept.filter(dup_frac <= max_dup_word_frac)
    # the gated frame feeds the bigram stream (three references through
    # the model aggs) AND the final score join — unpersisted, the whole
    # curate stack re-executed per reference (16 parquet scans in the
    # sf0.1 plan; the assemble_v3 defect, worse). Same fresh_persist
    # discipline; the vocabulary-sized pair table below is likewise
    # read by both the scoring join and the head-count rollup.
    # SCALE TRADEOFF (documented, not narrowable): unlike assemble_v3,
    # `text` must stay in this cache — the bigram stream reads the RAW
    # text (the LM scores pre-redaction text by design) and clean_text
    # is derived from the same raw text after the score gate, so the
    # persisted frame is corpus-sized with one text column. persist()'s
    # MEMORY_AND_DISK default makes an over-memory corpus spill rather
    # than fail; library callers outside the bench should
    # clear_persist_slots() (or unpersist) when done with the result —
    # the slot keeps at most one copy per process by construction.
    from ..relational.core import fresh_persist

    kept = fresh_persist("assemble_v2_kept", kept)

    # bigram LM over the gated corpus; model aggs are vocabulary-sized
    bg = kept.select(
        "doc_id",
        F.explode(F.expr(
            "transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),"
            " (x, i) -> struct(x AS w1, split(text, ' ')[i + 1] AS w2))"))
        .alias("b")).select("doc_id", "b.w1", "b.w2")
    pair_c = fresh_persist(
        "assemble_v2_pairc",
        bg.groupBy("w1", "w2").agg(F.count("*").alias("c2")))
    head_c = pair_c.groupBy("w1").agg(F.sum("c2").alias("c1"))
    # no broadcast hints: the model tables are vocabulary-sized (see
    # text_lm_score) — AQE picks broadcast while they fit
    scores = (bg.join(pair_c, ["w1", "w2"])
              .join(head_c, "w1")
              .groupBy("doc_id")
              .agg(F.avg(F.log2(F.col("c2").cast("double") / F.col("c1")))
                   .alias("lm_score")))
    # LEFT join + pass-through: a doc with zero bigrams (single
    # space-token text) has no row in `scores`; an inner join would
    # silently DELETE it from the corpus — not a quality decision, just
    # absence of evidence. No-evidence docs keep a neutral score of 0
    # (log2 P = 0 -> "perfectly predicted"), which passes any sane
    # threshold and is visible downstream in the lm_score column.
    kept = (kept.join(scores, "doc_id", "left")
            .withColumn("lm_score", F.coalesce("lm_score", F.lit(0.0)))
            .filter(F.col("lm_score") >= min_avg_log2_prob))

    clean = F.regexp_replace(
        F.regexp_replace("text", r"[a-z0-9._%+-]+@[a-z0-9.-]+", "<EMAIL>"),
        r"\b\d{3}[- ]\d{4}\b", "<PHONE>")
    kept = kept.withColumn("clean_text", clean)

    train = _with_split(kept).filter(F.col("split") == "train")
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return train.select(
        "doc_id", "lang", "source", "n_tokens", "bucket", "split",
        F.floor(cum_before / capacity).cast("long").alias("pack_id"),
        "clean_text", F.round("lm_score", 4).alias("lm_score"))


def assemble_v3(documents: DataFrame, batch_size: int = 8,
                max_rules_failed: int = 1) -> DataFrame:
    """The r12 corpus-QA program — cleanup-first curation where the
    DEDUP KEY is computed from the CLEANED text and the kept copy is
    the best-quality one, composed as one lazy plan:

        collapse immediate word repeats (the C4-style cleanup at word
          granularity; cleaned text carries forward)
          -> Gopher-style rule gate on the cleaned text (keep docs
             failing <= max_rules_failed of the 5 rules; attribution
             columns retained so every drop is explainable)
          -> quality-priority exact dedup on the CLEAN fingerprint:
             argmax(score, then min doc_id) per cluster via ONE
             max(struct) hash-agg — repeats collapsed first, so two
             copies differing only in stutter dedup together
          -> length-bucketed batching (power-of-two caps, md5-ordered
             batch numbers, per-doc pad_waste)

    Shuffle budget over the big table: the dedup hash-agg + its
    keep-join (1 exchange pair) and the length-bucket rank's
    (cap, md5-prefix bucket) window (1) — every gate is a narrow
    projection fused into the scan. Returns (doc_id, lang, source,
    n_tokens, n_collapsed, n_rules_failed, bucket_cap, batch_no,
    pad_waste, truncated, clean_text).

    Every stage expression comes from the SHARED builder its oracled
    registry face uses (collapse_repeats_col / with_gopher_metrics /
    norm_fp_col + diversity_score_col / length_bucket_cap_col +
    bucketed_hash_rank) — the faces prove the semantics against
    DuckDB; this program composes the proven builders, so a threshold
    or regex fix in any face propagates here by construction."""
    if int(batch_size) < 1:
        # batch_size is interpolated into the batch_no DIV expression:
        # 0 would divide by zero (ANSI error / silent NULL batch_no),
        # negatives would emit nonsense batch numbers silently
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    from ..relational.dataprep import (bucketed_hash_rank,
                                       length_bucket_cap_col)
    from ..relational.llm_ops import (GOPHER_RULES, collapse_repeats_col,
                                      diversity_score_col, norm_fp_col,
                                      with_gopher_metrics)

    ws = F.split("text", " ")
    cl = collapse_repeats_col("text")
    d = (documents
         .withColumn("clean_text", F.array_join(cl, " "))
         .withColumn("n_collapsed",
                     (F.size(ws) - F.size(cl)).cast("bigint")))

    d = with_gopher_metrics(d, "clean_text")
    n_passed = sum((F.col(a) for a in GOPHER_RULES[1:]),
                   F.col(GOPHER_RULES[0]))
    d = (d.withColumn("n_rules_failed",
                      (F.lit(5) - n_passed).cast("int"))
         .filter(F.col("n_rules_failed") <= max_rules_failed))

    d = (d.withColumn(
            "n_tokens",
            F.regexp_count("clean_text", F.lit(r"\w+")).cast("bigint"))
         .withColumn("fp", norm_fp_col("clean_text"))
         .withColumn("score_key", diversity_score_col("clean_text")))
    # the scored frame feeds the keep-agg, the keep-join probe side, and
    # (through them) both references the batch rank makes — without the
    # persist the collapse+gopher+fingerprint regex stack (the whole
    # program's compute) re-executes per reference: 8 parquet scans in
    # the unpersisted sf0.1 plan, and the bench's ratio 1.08 showed the
    # program was ~all fixed recompute, not data. Same fresh_persist
    # discipline as the oracled faces (guide §5: reused AND expensive).
    # r15 (guide §5/§2.3 — cache only what downstream reads): project
    # the persist to exactly the columns the rest of the program
    # touches. Raw `text` (corpus-sized, fully superseded by
    # clean_text here) and the per-rule Gopher flag/metric columns
    # (already folded into n_rules_failed) never escape this function,
    # so caching them doubled the corpus-sized bytes per row for
    # nothing. persist() stays at its MEMORY_AND_DISK default, so an
    # over-memory corpus spills instead of evicting/failing.
    from ..relational.core import fresh_persist

    d = fresh_persist("assemble_v3_scored", d.select(
        "doc_id", "lang", "source", "n_tokens", "n_collapsed",
        "n_rules_failed", "fp", "score_key", "clean_text"))
    keep = (d.groupBy("fp")
            .agg(F.max(F.struct(F.col("score_key"),
                                (-F.col("doc_id")).alias("nd"))).alias("b"))
            .select("fp", (-F.col("b.nd")).alias("doc_id")))
    d = d.join(keep, ["fp", "doc_id"])   # keep only each cluster's best

    d = (d.withColumn("bucket_cap", length_bucket_cap_col("n_tokens"))
         .withColumn("h", F.md5(F.col("doc_id").cast("string"))))
    ranked = bucketed_hash_rank(d, ["bucket_cap"], "h", "doc_id",
                                out_col="_r")
    return ranked.select(
        "doc_id", "lang", "source", "n_tokens", "n_collapsed",
        "n_rules_failed", "bucket_cap",
        F.expr(f"CAST((_r - 1) DIV {int(batch_size)} AS BIGINT)")
        .alias("batch_no"),
        F.greatest(F.col("bucket_cap") - F.col("n_tokens"), F.lit(0))
        .cast("bigint").alias("pad_waste"),
        (F.col("n_tokens") > F.col("bucket_cap")).cast("int")
        .alias("truncated"),
        "clean_text")
