#!/usr/bin/env python
"""Training-data curation demo: documents -> quality/lang gates -> exact
dedup -> deterministic embeddings -> LSH buckets, then a bucket-pruned
similarity probe — and finally the curated corpus exported as
shard-atomic training shards with a checksum manifest (llm/shards.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from process_nwb_spark import get_spark
from process_nwb_spark.llm.curation import curate
from process_nwb_spark.relational.core import T

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark("curation-demo")
    docs = T(spark, SF, "documents")
    curated = curate(docs, langs=("en", "de", "es", "fr")).cache()

    print("kept", curated.count(), "of", docs.count(), "documents")
    curated.groupBy("bucket").count().orderBy("bucket").show(16)

    # probe: docs sharing the first doc's LSH bucket (the ANN candidate set)
    probe = curated.limit(1).select(F.col("bucket").alias("qb"))
    cands = curated.join(F.broadcast(probe), curated.bucket == probe.qb)
    print("candidate set size:", cands.count())

    # sink: curated corpus -> deterministic training shards + manifest
    import tempfile

    from process_nwb_spark.llm.shards import (export_training_shards,
                                              verify_export)

    work = tempfile.mkdtemp(prefix="curated_shards_")
    out = work + "/corpus"
    manifest = export_training_shards(curated.drop("bucket"), out, "doc_id",
                                      n_shards=8, size_cols=("n_tokens",))
    manifest.orderBy("shard").show()
    print("export verified:", verify_export(spark, out, "doc_id"))
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
