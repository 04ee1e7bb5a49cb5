#!/usr/bin/env python
"""Corpus-QA demo: the inspection queries a corpus owner runs BEFORE
filtering anything, then the cleanup-first assembly that acts on them —
composed from registry faces plus `llm/curation.assemble_v3`.

1. `quality_rule_stats`     — which of the five Gopher rules is doing
   the filtering (per-rule failure shares from ONE scan): a rule
   failing most of the corpus is usually a rule bug, not a corpus
   problem;
2. `quality_gopher_rules`   — per-doc attribution for a few failing
   docs (every drop explainable);
3. `corpus_source_overlap`  — which source pairs share shingles (two
   overlapping sources should not both be upweighted; a high-overlap
   small source is a subset mirror);
4. `text_collapse_repeats`  — how much token-level stutter the cleanup
   removes;
5. `assemble_v3`            — the program acting on all of it: collapse
   -> gate on cleaned text -> best-of-cluster dedup on the clean
   fingerprint -> padding-efficient length-bucketed batches.

The streaming twin `gopher_stats_sink` maintains step 1 live as
batches arrive; this demo shows the batch decision path.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from process_nwb_spark import get_spark
from process_nwb_spark.relational.core import all_queries

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark("corpus-qa-demo")
    qs = all_queries()

    # 1. which rule is doing the filtering?
    s = qs["quality_rule_stats"].fn(spark, SF).first()
    print(f"gate attribution over {s.n_docs} docs "
          f"(pass rate {s.pass_rate:.1%}):")
    for rule in ("word_count", "mean_word_len", "symbol_ratio",
                 "stopwords", "dup_words"):
        share = getattr(s, f"share_fail_{rule}")
        print(f"  {rule:>14}: {share:.1%} of docs fail")

    # 2. per-doc attribution for the worst offenders
    worst = (qs["quality_gopher_rules"].fn(spark, SF)
             .filter(F.col("n_rules_failed") > 0)
             .orderBy(F.desc("n_rules_failed"), "doc_id").limit(3)
             .collect())
    print("\nworst offenders (per-doc attribution):")
    for r in worst:
        failed = [f for f in ("r_word_count", "r_mean_word_len",
                              "r_symbol_ratio", "r_stopwords",
                              "r_dup_words") if getattr(r, f) == 0]
        print(f"  doc {r.doc_id}: fails {r.n_rules_failed} "
              f"({', '.join(f[2:] for f in failed)})")

    # 3. source-pair duplication map
    top = (qs["corpus_source_overlap"].fn(spark, SF)
           .orderBy(F.desc("jaccard")).limit(3).collect())
    print("\nmost-overlapping source pairs (shingle Jaccard):")
    for r in top:
        print(f"  {r.source_a} ~ {r.source_b}: J={r.jaccard:.3f} "
              f"({r.n_common} shared of {r.vocab_a}/{r.vocab_b})")

    # 4. how much stutter does the cleanup remove?
    c = (qs["text_collapse_repeats"].fn(spark, SF)
         .agg(F.sum("n_words").alias("w"),
              F.sum("n_collapsed").alias("c"),
              F.sum((F.col("n_collapsed") > 0).cast("int")).alias("d"))
         .first())
    print(f"\ncleanup: {c.c} of {c.w} words are immediate repeats "
          f"({c.d} docs affected)")

    # 5. corpus statistics: is the corpus still introducing novel text,
    # and how efficiently does the tokenizer cover each source?
    growth = (qs["vocab_growth_curve"].fn(spark, SF)
              .orderBy("prefix_decile").collect())
    first, last = growth[0], growth[-1]
    prev = growth[-2] if len(growth) > 1 else first
    print(f"\nvocabulary growth (Heaps): decile 1 -> {first.vocab} words, "
          f"decile {last.prefix_decile} -> {last.vocab} "
          f"(novelty tail {(last.vocab - prev.vocab)} new words "
          f"in the last decile)")
    fert = (qs["tokenizer_fertility"].fn(spark, SF)
            .orderBy(F.desc("fertility")).limit(2).collect())
    for r in fert:
        print(f"  tokenizer fertility {r.source}: {r.fertility:.3f} "
              f"tokens/word, {r.chars_per_token:.2f} chars/token")

    # 6. the program acting on all of it
    from process_nwb_spark.llm.curation import assemble_v3

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = assemble_v3(docs).cache()
    n = out.count()
    if n == 0:
        print("\nassemble_v3 kept 0 docs — every doc failed the gate; "
              "read the attribution table above for which rule")
        spark.stop()
        return
    waste = (out.agg(F.sum("pad_waste").alias("p"),
                     F.sum("bucket_cap").alias("cap")).first())
    by_cap = (out.groupBy("bucket_cap")
              .agg(F.count("*").alias("docs"),
                   (F.max("batch_no") + 1).alias("batches"))
              .orderBy("bucket_cap").collect())
    print(f"\nassemble_v3 kept {n} docs -> length-bucketed batches "
          f"(padding waste {waste.p}/{waste.cap} slots "
          f"= {waste.p / max(waste.cap, 1):.1%}):")
    for r in by_cap:
        print(f"  cap {r.bucket_cap:>4}: {r.docs} docs in "
              f"{r.batches} batches")
    spark.stop()


if __name__ == "__main__":
    main()
