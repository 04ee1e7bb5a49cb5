#!/usr/bin/env python
"""Similarity-search demo: the four ANN tiers over the same query vector —
brute-force exact cosine, sign-LSH buckets, IVF cells, and PQ/ADC codes —
printed side by side with wall times. Each tier is a registry query with
its own oracle (embed_cosine_topk is the ground truth the recall test in
test_relational.py measures the others against)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from process_nwb_spark import get_spark
from process_nwb_spark.relational.core import all_queries

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

TIERS = [
    ("exact cosine (brute force)", "embed_cosine_topk"),
    ("sign-LSH buckets", "embed_ann_lsh"),
    ("IVF nearest cell", "embed_ivf_topk"),
    ("IVF nprobe=2", "embed_ivf_probe2"),
    ("PQ + ADC codes", "embed_pq_adc"),
]


def main():
    spark = get_spark("similarity-demo")
    q = all_queries()
    exact_ids = None
    for label, name in TIERS:
        t0 = time.time()
        rows = q[name].fn(spark, SF).collect()
        dt = time.time() - t0
        ids = [r["vec_id"] for r in rows]
        recall = ("  recall@10=%.1f" % (len(set(ids) & exact_ids) / 10)
                  if exact_ids is not None else " (ground truth)")
        print(f"{label:28s} [{dt:5.2f}s]{recall}")
        print("   top:", ids[:10])
        if exact_ids is None:
            exact_ids = set(ids)

    print("\n-- sparse + hybrid (documents side) --")
    for label, name in (("BM25 (sparse)", "text_bm25_search"),
                        ("RRF hybrid (sparse+dense)", "hybrid_search_rrf")):
        t0 = time.time()
        rows = q[name].fn(spark, SF).collect()
        print(f"{label:28s} [{time.time() - t0:5.2f}s]")
        print("   top:", [r["doc_id"] for r in rows])
    spark.stop()


if __name__ == "__main__":
    main()
