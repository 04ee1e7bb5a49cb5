#!/usr/bin/env python
"""Tokenizer & duplication policy demo: the r14 decision path a corpus
owner runs when fixing a tokenizer vocabulary and a duplication budget
— composed from registry faces.

1. `corpus_word_burstiness`  — which words are function-like (Fano ~ 1,
   uniform across docs) vs topical/bursty (Fano >> 1): the signal
   behind stopword derivation and shingle df-cut tuning;
2. `tokenizer_oov_rate`      — against the top-N vocabulary proxy,
   WHICH source falls off the tokenizer (high OOV = fragments into
   unknowns and trains poorly);
3. `quality_rule_ablation`   — which Gopher rule is the binding
   constraint (large sole-failure count) vs redundant (rejections all
   co-flagged) before any rule deletes data single-handedly;
4. `dedup_cluster_cap`       — the bounded-duplication keep decision
   (keep up to K copies per exact cluster — the data-constrained
   regime where a few epochs of repetition beat hard dedup) and the
   token mass each policy keeps;
5. `embed_cell_balance`      — IVF index health (scaled_load per cell:
   whether nprobe=1 really touches 1/k of the corpus);
6. `embed_margin_bitext`     — margin-based mining over those cells
   (the hub-suppressing ratio margin), acceptance rate reported.

The streaming twin `oov_rate_sink` maintains step 2 live as batches
arrive; this demo shows the batch decision path.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from process_nwb_spark import get_spark
from process_nwb_spark.relational.core import all_queries

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark("tokenizer-dedup-policy-demo")
    qs = all_queries()

    # 1. burstiness profile: most-uniform and most-bursty words
    b = qs["corpus_word_burstiness"].fn(spark, SF).toPandas()
    scored = b[b.fano.notna()].sort_values("fano")
    print("word burstiness (Fano ~1 = function-like, >>1 = topical):")
    for _, r in scored.head(3).iterrows():
        print(f"  uniform: {r.w:>10}  fano {r.fano:.3f}  df {r.df}")
    for _, r in scored.tail(3).iterrows():
        print(f"  bursty:  {r.w:>10}  fano {r.fano:.3f}  df {r.df}")

    # 2. who falls off the vocabulary?
    oov = (qs["tokenizer_oov_rate"].fn(spark, SF).toPandas()
           .sort_values("oov_rate", ascending=False))
    print("\nOOV rate per source (top-N vocab proxy):")
    for _, r in oov.head(3).iterrows():
        print(f"  {r.source:>8}: {r.oov_rate:.1%} of {r.n_tokens} tokens "
              f"({r.n_oov_types} OOV types)")

    # 3. which gate rule binds?
    abl = (qs["quality_rule_ablation"].fn(spark, SF).toPandas()
           .sort_values("n_sole_fail", ascending=False))
    print("\ngate-rule ablation (sole failures = docs back if dropped):")
    for _, r in abl.iterrows():
        print(f"  {r.rule:>16}: fails {r.n_fail}, sole {r.n_sole_fail}")

    # 4. bounded-duplication keep decision
    cap = qs["dedup_cluster_cap"].fn(spark, SF)
    pol = cap.agg(
        F.count("*").alias("docs"),
        F.sum("kept").alias("kept_k2"),
        F.sum((F.col("copy_rank") == 1).cast("int")).alias("kept_k1"),
    ).first()
    print(f"\nduplication budget over {pol.docs} docs: "
          f"keep-1 retains {pol.kept_k1}, keep-2 retains {pol.kept_k2} "
          f"(+{pol.kept_k2 - pol.kept_k1} bounded repeats)")

    # 5. index health before trusting the cells
    cb = qs["embed_cell_balance"].fn(spark, SF).toPandas()
    worst = cb.sort_values("scaled_load", ascending=False).iloc[0]
    print(f"\nIVF cell balance: {len(cb)} cells, worst scaled_load "
          f"{worst.scaled_load:.2f} (cell {worst.cid}, "
          f"{worst.n_vecs} vectors)")

    # 6. margin mining over those cells
    mb = qs["embed_margin_bitext"].fn(spark, SF)
    acc = mb.agg(F.count("*").alias("n"),
                 F.sum("accepted").alias("acc")).first()
    print(f"margin mining: {acc.n} queries, {acc.acc} accepted "
          f"(ratio margin >= 1.05)")

    spark.stop()


if __name__ == "__main__":
    main()
