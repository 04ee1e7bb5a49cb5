#!/usr/bin/env python
"""Mixture-decision demo: the queries a mixture owner runs BEFORE
materializing a training mix, composed from registry faces — all
scan-bounded, all deterministic, so the decision is reproducible from
the corpus alone.

1. `quality_survival_curve`    — how many docs/tokens survive each
   candidate quality cut (ten thresholds, ONE corpus scan): pick the
   cut that keeps the token budget feasible;
2. `mix_doremi_weights`        — DoReMi domain weights from the
   clipped excess-loss proxy (linearized multiplicative-weights
   update): which domains to upweight;
3. `mix_token_budget`          — materialize the per-domain keep set:
   best-scored docs per source until the token budget;
4. `mix_curriculum_interleave` — the reading order: easy-to-hard
   within each source, round-robin across sources by arithmetic slot
   assignment (no global sort anywhere in the tier).

The streaming twin `doremi_weights_sink` maintains step 2 live as
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
    spark = get_spark("mix-decision-demo")
    qs = all_queries()

    # 1. survival curve: what does each quality cut cost in tokens?
    curve = (qs["quality_survival_curve"].fn(spark, SF)
             .orderBy("threshold").collect())
    print("quality-gate survival (threshold -> docs, token share):")
    for r in curve:
        print(f"  >= {r.threshold:>5}: {r.n_docs_kept:>4} docs, "
              f"{r.token_survival:.1%} of tokens")

    # 2. DoReMi weights: which domains does the MW update favor?
    w = (qs["mix_doremi_weights"].fn(spark, SF)
         .orderBy(F.desc("doremi_weight")).collect())
    print("\nDoReMi weights (vs token share — positive delta = upweighted):")
    for r in w[:5]:
        delta = r.doremi_weight - r.token_share
        print(f"  {r.source}: weight {r.doremi_weight:.4f} "
              f"(share {r.token_share:.4f}, {delta:+.4f}, "
              f"excess {r.excess_loss:.4f})")

    # 3. token-budget keep set per source
    kept = qs["mix_token_budget"].fn(spark, SF)
    stats = (kept.groupBy("source")
             .agg(F.count("*").alias("docs"),
                  F.sum("n_tokens").alias("tokens"))
             .orderBy("source").limit(5).collect())
    print("\ntoken-budget keep set (first 5 sources):")
    for r in stats:
        print(f"  {r.source}: {r.docs} docs / {r.tokens} tokens kept")

    # 4. curriculum order: the first 10 interleaved slots
    cur = (qs["mix_curriculum_interleave"].fn(spark, SF)
           .orderBy("slot").limit(10).collect())
    print("\ncurriculum head (slot: source rank=rank_in_source score):")
    for r in cur:
        print(f"  {r.slot:>3}: {r.source} rank={r.rank_in_source} "
              f"score={r.score_key}")

    # 5. anneal schedule: where the final high-quality phase begins
    ann = qs["mix_anneal_schedule"].fn(spark, SF).cache()
    phases = {int(r.phase): (r.docs, r.toks) for r in
              ann.groupBy("phase")
              .agg(F.count("*").alias("docs"),
                   F.sum("n_tokens").alias("toks")).collect()}
    print("\nanneal schedule (phase -> docs, tokens):")
    for ph in sorted(phases):
        d_, t_ = phases[ph]
        name = "main" if ph == 0 else "anneal"
        print(f"  phase {ph} ({name}): {d_} docs / {t_} tokens")
    boundary = (ann.filter(F.col("phase") == 1)
                .agg(F.min("position")).first()[0])
    print(f"  anneal phase starts at stream position {boundary}")

    spark.stop()


if __name__ == "__main__":
    main()
