"""Graph analytics over the star schema: iterative algorithms expressed as
DataFrame loops (joins + aggregations per round).

The scale shape: the 100 TB FACT data is aggregated ONCE into the graph
(edges + weights, orders of magnitude smaller), and the iterations then run
on the graph — each round one equi-join shuffle keyed by node id. This is
how production graph pipelines run on Spark (GraphFrames does the same
under the hood); connected components live in llm_ops.dedup_components.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from .core import T, query

_D = 0.85          # damping
_N_ITERS = 5       # fixed iteration count keeps the oracle replayable
_N_NATIONS = 25


def _edges_sql() -> str:
    return """
    edges AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               CAST(COUNT(*) AS DOUBLE) AS w
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ),
    outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
    contrib AS (
        SELECT e.src, e.dst, e.w / o.ow AS cw
        FROM edges e JOIN outw o ON o.src = e.src
    )
    """


def _pagerank_oracle() -> str:
    base = 1.0 / _N_NATIONS
    tele = (1.0 - _D) / _N_NATIONS
    ctes = [_edges_sql(),
            f"r0 AS (SELECT n_nationkey AS node, {base!r} AS rank "
            f"FROM nation)"]
    for t in range(_N_ITERS):
        ctes.append(f"""
    r{t + 1} AS (
        SELECT n.node,
               {tele!r} + {_D!r} * COALESCE(SUM(r.rank * c.cw), 0.0) AS rank
        FROM r{t} n
        LEFT JOIN contrib c ON c.dst = n.node
        LEFT JOIN r{t} r ON r.node = c.src
        GROUP BY n.node
    )""")
    return ("WITH " + ",".join(ctes) +
            f"""
    SELECT r.node AS nationkey, n.n_name AS nation,
           ROUND(r.rank, 6) AS pagerank
    FROM r{_N_ITERS} r JOIN nation n ON n.n_nationkey = r.node
    """)


@query(
    "graph_pagerank",
    _pagerank_oracle(),
    doc=f"weighted PageRank (d={_D}, {_N_ITERS} fixed iterations) over the "
        "customer-nation -> supplier-nation trade graph. The fact tables "
        "aggregate ONCE into (src, dst, weight) edges — that join chain is "
        "the only 100 TB-sized work — and each PR round is then one "
        "edge⋈rank join + a sum per destination on the graph, which is "
        "orders of magnitude smaller (the standard fact->graph->iterate "
        "split). Edges and out-weights are cached across rounds; the "
        "oracle unrolls the same five rounds as chained CTEs so every "
        "intermediate is replayable",
)
def graph_pagerank(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")

    edges = (li.join(o, li.l_orderkey == o.o_orderkey)
             .join(c, o.o_custkey == c.c_custkey)
             .join(s, li.l_suppkey == s.s_suppkey)
             .groupBy(F.col("c_nationkey").alias("src"),
                      F.col("s_nationkey").alias("dst"))
             .agg(F.count("*").cast("double").alias("w"))
             .cache())
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # contribution weight per edge, fixed across iterations
    contrib = (edges.join(outw, "src")
               .select("src", "dst", (F.col("w") / F.col("ow")).alias("cw"))
               .cache())

    tele = (1.0 - _D) / _N_NATIONS
    ranks = n.select(F.col("n_nationkey").alias("node"),
                     F.lit(1.0 / _N_NATIONS).alias("rank"))
    for _ in range(_N_ITERS):
        incoming = (contrib.join(ranks, contrib.src == ranks.node)
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.sum(F.col("rank") * F.col("cw")).alias("inc")))
        ranks = (n.select(F.col("n_nationkey").alias("node"))
                 .join(incoming, "node", "left")
                 .select("node",
                         (F.lit(tele)
                          + F.lit(_D) * F.coalesce("inc", F.lit(0.0)))
                         .alias("rank")))

    return (ranks.join(n, ranks.node == n.n_nationkey)
            .select(F.col("node").alias("nationkey"),
                    F.col("n_name").alias("nation"),
                    F.round("rank", 6).alias("pagerank")))
