#!/usr/bin/env python
"""Training-mix demo: the determinism-first path from a curated corpus to
an epoch-ordered training stream, composed from registry faces.

1. `split_leakage_safe`   — train/test where the split unit is the
   near-dup CLUSTER (no LSH candidate pair can straddle the split: the
   Lee et al. 2022 contamination mode prevented structurally);
2. `mix_lang_temperature` — XLM-R-style alpha=0.5 temperature
   resampling: every doc gets an integer n_copies (majority languages
   down-sample, low-resource languages repeat), seedlessly;
3. `mix_epoch_shuffle`    — a different reproducible permutation per
   epoch from md5(epoch:doc_id), positions dense 1..n via bucketed
   rank (no single-task sort) — and the demo shows the MID-EPOCH
   RESUME property: recomputing and filtering position > checkpoint
   yields exactly the remaining stream, no RNG state to restore.

Every step is pure recomputation — any worker, any retry, any restart
derives the identical mix. That property, not speed, is why large
training pipelines shuffle with hashes instead of RNGs.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from process_nwb_spark import get_spark
from process_nwb_spark.relational.core import all_queries

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark("training-mix-demo")
    qs = all_queries()

    # 1. leakage-safe split: near-dup clusters are indivisible
    split = qs["split_leakage_safe"].fn(spark, SF).cache()
    counts = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    print(f"leakage-safe split: {counts} "
          "(near-dup clusters never straddle)")

    # 2. temperature resampling: per-doc integer copies
    mix = qs["mix_lang_temperature"].fn(spark, SF).cache()
    per_lang = (mix.groupBy("lang")
                .agg(F.count("*").alias("docs"),
                     F.sum("n_copies").alias("copies"))
                .orderBy("lang"))
    print("alpha=0.5 language mix (docs -> copies in the training set):")
    for r in per_lang.collect():
        print(f"  {r.lang}: {r.docs} -> {r.copies}")

    # 3. epoch shuffle over the TRAIN side of the mix, epochs 0..2
    order = qs["mix_epoch_shuffle"].fn(spark, SF)
    train_ids = split.filter(F.col("split") == "train").select("doc_id")
    stream = (order.join(train_ids, "doc_id")
              .join(mix.filter(F.col("n_copies") > 0)
                    .select("doc_id"), "doc_id"))
    head = (stream.filter(F.col("epoch") == 0).orderBy("position")
            .limit(5).collect())
    print("epoch-0 stream head:",
          [(r.position, r.doc_id) for r in head])

    # mid-epoch resume: recompute, filter past the checkpoint — the
    # continuation is identical to what an uninterrupted run would read
    ckpt = head[-1].position
    resumed = (stream.filter((F.col("epoch") == 0)
                             & (F.col("position") > ckpt))
               .orderBy("position").limit(3).collect())
    print(f"resume after position {ckpt}:",
          [(r.position, r.doc_id) for r in resumed])

    # different epoch, different (deterministic) order
    e1 = (stream.filter(F.col("epoch") == 1).orderBy("position")
          .limit(5).collect())
    print("epoch-1 stream head:",
          [(r.position, r.doc_id) for r in e1])

    spark.stop()


if __name__ == "__main__":
    main()
