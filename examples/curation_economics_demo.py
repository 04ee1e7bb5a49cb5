#!/usr/bin/env python
"""Curation economics demo: the r14 fourth-batch decision path a corpus
owner runs to PRICE a curation plan before executing it — every number
comes from the same shared builder as the face that will act on it, so
the plan and the execution cannot disagree.

1. `dedup_threshold_sweep`  — where to place the semantic-dedup cosine
   cut: pairs and affected docs per threshold over exactly the pairs
   dedup_embed_cosine emits (the n_docs elbow is the operating point);
2. `quality_gate_tradeoff`  — what each Gopher-gate strictness level
   costs in documents and tokens (k = 0..5 failed rules allowed);
3. `quality_lm_agreement`   — whether the rule gate and the bigram-LM
   fluency filter agree (negative r = agree; redundant filters -> run
   only the cheaper scan-only gate);
4. `tokenizer_vocab_sweep`  — the vocabulary-size knee: token-mass
   coverage of the top-N vocab for N in 4..64;
5. `mix_dedup_budget`       — waterfilling the token budget over
   UNIQUE capacities (the dup tax per source made explicit);
6. `mix_repeat_budget`      — when the budget exceeds the deduped
   corpus: the per-source repetition schedule under the 4-epoch
   ceiling (Muennighoff's data-constrained regime).

The streaming twin `split_contamination_sink` keeps the benchmark-protection
audit (split_contamination) live beside this batch decision path.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from process_nwb_spark import get_spark
from process_nwb_spark.relational.core import all_queries

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark("curation-economics-demo")
    qs = all_queries()

    # 1. price the near-dup threshold
    sw = (qs["dedup_threshold_sweep"].fn(spark, SF).toPandas()
          .sort_values("threshold"))
    print("near-dup threshold sweep (pairs / docs affected):")
    for _, r in sw.iterrows():
        print(f"  cos >= {r.threshold:.2f}: {int(r.n_pairs):>5} pairs, "
              f"{int(r.n_docs):>5} docs touched")

    # 2. price the gate strictness
    tr = (qs["quality_gate_tradeoff"].fn(spark, SF).toPandas()
          .sort_values("max_fail"))
    print("\nGopher-gate strictness tradeoff:")
    for _, r in tr.iterrows():
        print(f"  <= {int(r.max_fail)} rules failed: "
              f"{r.doc_share:.1%} docs, {r.token_share:.1%} tokens kept")

    # 3. are the two filters redundant?
    ag = qs["quality_lm_agreement"].fn(spark, SF).toPandas()
    corr = ag[ag.pearson_r.notna()]
    print("\ngate vs LM-surprisal agreement (negative r = agree):")
    print(f"  {len(corr)}/{len(ag)} sources with variance; "
          f"mean r {corr.pearson_r.mean():+.4f}" if len(corr)
          else "  no source has variance on both axes at this sf")

    # 4. vocabulary-size knee
    vs = (qs["tokenizer_vocab_sweep"].fn(spark, SF).toPandas()
          .sort_values("vocab_n"))
    print("\nvocabulary-size coverage curve:")
    for _, r in vs.iterrows():
        print(f"  top-{int(r.vocab_n):>3}: {r.coverage:.1%} of token mass")

    # 5-6. spend the budget: dedup-aware, then with repetition
    db = qs["mix_dedup_budget"].fn(spark, SF).toPandas()
    rb = (qs["mix_repeat_budget"].fn(spark, SF).toPandas()
          .set_index("source"))
    print("\ndedup-aware waterfilling (top dup-tax sources):")
    for _, r in (db.sort_values("dup_token_share", ascending=False)
                 .head(3).iterrows()):
        ep = rb.loc[r.source].epochs
        ep_s = f"{ep:.2f}" if ep == ep else "NULL"
        print(f"  {r.source:>8}: dup tax {r.dup_token_share:.1%}, "
              f"alloc {r.alloc_tokens:.0f}/{r.cap_tokens} unique tokens, "
              f"repeat plan {ep_s} epochs")
    total_alloc = db.alloc_tokens.sum()
    print(f"  budget {int(db.budget.iloc[0])} tokens, "
          f"allocated {total_alloc:.0f} (feasible, max-min fair)")

    spark.stop()


if __name__ == "__main__":
    main()
