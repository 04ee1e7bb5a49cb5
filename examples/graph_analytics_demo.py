#!/usr/bin/env python
"""Graph-analytics tier demo: the fact tables aggregate ONCE into small
graphs, and every iterative algorithm then runs on the graph — the
fact→graph→iterate split that makes graph analytics tractable at 100 TB.

1. `graph_pagerank`          — weighted PageRank over the nation trade
   graph (who is central to trade flow);
2. `graph_bfs_hops`          — Pregel-style BFS distances from nation 0;
3. `graph_kcore_peel`        — coreness stratification (hub triage);
4. `graph_label_propagation` — community detection;
5. `graph_wcc_star`          — connected components of the part
   co-purchase chain graph via O(log n) large-star/small-star
   contraction, whose oracle is the ground-truth reachability fixpoint:
   a green gate PROVES the bounded rounds converged;
6. `graph_triangles` + `graph_assortativity` — clustering mass and the
   degree-mixing prior that justifies degree-oriented strategies.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from process_nwb_spark import get_spark
from process_nwb_spark.relational.core import all_queries

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark(shuffle_partitions=8)
    qs = all_queries()

    print("== 1. weighted PageRank (top 5 nations) ==")
    for r in qs["graph_pagerank"].fn(spark, SF).orderBy(
            "pagerank", ascending=False).take(5):
        print(f"   {r.nation:<18} {r.pagerank:.6f}")

    print("== 2. BFS hops from nation 0 ==")
    hops = qs["graph_bfs_hops"].fn(spark, SF).toPandas()
    print("   reachable:", hops.hops.notna().sum(),
          "max hops:", int(hops.hops.max()))

    print("== 3. k-core coreness distribution ==")
    core = qs["graph_kcore_peel"].fn(spark, SF).toPandas()
    print("   " + ", ".join(
        f"core{k}: {n}" for k, n in
        core.groupby("coreness").size().items()))

    print("== 4. label-propagation communities ==")
    lpa = qs["graph_label_propagation"].fn(spark, SF).toPandas()
    print("   communities:", lpa.community.nunique(),
          "largest:", int(lpa.groupby("community").size().max()))

    print("== 5. WCC by star contraction (converged, oracle-proven) ==")
    wcc = qs["graph_wcc_star"].fn(spark, SF).toPandas()
    print("   nodes:", len(wcc), "components:", wcc.component.nunique(),
          "largest:", int(wcc.component_size.max()))

    print("== 6. triangles + assortativity ==")
    tri = qs["graph_triangles"].fn(spark, SF).first()
    asst = qs["graph_assortativity"].fn(spark, SF).first()
    print(f"   triangles: {tri.n_triangles} (from {tri.n_wedges} wedges "
          f"over {tri.n_edges} edges), degree assortativity: "
          f"{asst.assortativity:.4f}")

    spark.stop()


if __name__ == "__main__":
    main()
