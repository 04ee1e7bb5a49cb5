#!/usr/bin/env python
"""Corpus dedup decision demo: every document gets an actionable keep/drop
verdict from two independent signals —
  1. lexical near-dup: MinHash/LSH candidate graph -> connected components
     -> min-id canonical keeper (`dedup_keep_list`);
  2. semantic near-dup: IVF clusters over the embedding table ->
     within-cluster cosine -> SemDeDup-style duplicate flags
     (`semantic_dedup`).
The final anti-join is what a curation pipeline would feed the tokenizer."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from process_nwb_spark import get_spark
from process_nwb_spark.relational.core import T, all_queries

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark("dedup-decision-demo")
    qs = all_queries()

    keep = qs["dedup_keep_list"].fn(spark, SF).cache()
    n_docs = keep.count()
    n_drop = keep.filter(F.col("keep") == 0).count()
    print(f"lexical near-dup: dropping {n_drop} of {n_docs} documents")
    (keep.filter(F.col("keep") == 0)
     .groupBy("component").count().orderBy(F.desc("count")).show(5))

    sem = qs["semantic_dedup"].fn(spark, SF).cache()
    n_sem = sem.filter(F.col("is_dup") == 1).count()
    print(f"semantic near-dup: flagging {n_sem} of {sem.count()} vectors")
    sem.groupBy("cid").agg(F.sum("is_dup").alias("n_dups")).orderBy("cid").show()

    # the deliverable: documents surviving BOTH gates
    docs = T(spark, SF, "documents")
    survivors = (docs
                 .join(keep.filter(F.col("keep") == 1).select("doc_id"),
                       "doc_id")
                 .join(sem.filter(F.col("is_dup") == 0)
                       .select(F.col("vec_id").alias("doc_id")), "doc_id"))
    print("documents surviving both gates:", survivors.count())
    spark.stop()


if __name__ == "__main__":
    main()
