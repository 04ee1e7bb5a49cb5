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


@query(
    "graph_triangles",
    """
    WITH lines AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    edges AS (
        SELECT DISTINCT a.pk AS u, b.pk AS v
        FROM lines a JOIN lines b ON a.ok = b.ok AND a.pk < b.pk
    ),
    deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT u AS node FROM edges
            UNION ALL SELECT v AS node FROM edges
        ) GROUP BY node
    ),
    oriented AS (
        SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END
                 AS src,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END
                 AS dst
        FROM edges e
        JOIN deg du ON du.node = e.u
        JOIN deg dv ON dv.node = e.v
    ),
    wedges AS (
        SELECT o1.dst AS b, o2.dst AS c
        FROM oriented o1 JOIN oriented o2
          ON o1.src = o2.src AND o1.dst < o2.dst
    ),
    tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM wedges w
        JOIN edges e ON e.u = w.b AND e.v = w.c
    )
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg)
             AS n_wedges,
           (SELECT n_triangles FROM tri) AS n_triangles
    """,
    doc="triangle counting over the co-purchase part graph, degree-"
        "oriented compact-forward: edges are distinct same-order part "
        "pairs (per-order fan-out bounded by basket size, never all-pairs "
        "over parts), each edge is oriented from its (degree, id)-smaller "
        "endpoint — out-degree is O(sqrt(m)) under any skew — and "
        "n_triangles = sum over oriented edges (u,v) of "
        "|N+(u) INTERSECT N+(v)| on degree-bounded sorted adjacency "
        "arrays (each triangle x->y, x->z, y->z is counted exactly once, "
        "at edge (x,y)). The wedge table is never materialized or "
        "shuffled: the r14 rewrite replaced the wedge enumeration + "
        "semi-join closure (a sum-d+^2-row exchange and sort; 41 M rows "
        "at sf0.1 for 1.2 M edges) with per-edge array_intersect, same "
        "integer count proven equal. Every count is an integer; "
        "n_wedges = sum d*(d-1)/2 is the clustering-coefficient "
        "denominator",
)
def graph_triangles(spark, sf_dir):
    from .core import fresh_persist

    # edges feeds degree, orientation AND the edge-count stat; deg feeds
    # du/dv/stats; oriented feeds the adjacency fold and both closure
    # join sides. NONE of these reuse without an explicit persist (no
    # ReusedExchange across the self-join split — measured 28 lineitem
    # scans / 74 exchanges uncached, 15.5 s at sf0.1 vs 3.4 s
    # persisted). fresh_persist drops the previous call's copy so bench
    # passes recompute honestly.
    #
    # r15 edge construction (guide §2.3 — aggregate before you fan out):
    # the r14 plan built edges from a DISTINCT (ok, pk) table self-joined
    # on ok — one lineitem-wide distinct exchange, then TWO more ok-keyed
    # exchanges + sorts for the SMJ, then the (u, v) distinct. The same
    # edge set folds from ONE groupBy(ok) collect_set: each order's
    # distinct part set is basket-bounded (TPC-H baskets are <= ~7
    # parts, never hub-sized), and all (u < v) pairs are emitted
    # row-locally from the sorted set — collect_set dedups exactly what
    # the old DISTINCT did, and pairs of a sorted array satisfy u < v by
    # construction, so the pair multiset entering the (u, v) distinct is
    # identical. Three lineitem-scale exchanges + two sorts become one
    # map-side-combined exchange. The size >= 2 filter is REQUIRED, not
    # cosmetic: sequence(0, -1) on a 1-part basket would step backwards.
    li = T(spark, sf_dir, "lineitem")
    baskets = (li.groupBy(F.col("l_orderkey").alias("ok"))
               .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps")))
    pair_combos = F.expr(
        "flatten(transform(sequence(0, size(ps) - 2),"
        " i -> transform(sequence(i + 1, size(ps) - 1),"
        " j -> struct(ps[i] AS u, ps[j] AS v))))")
    edges = fresh_persist(
        "tri_edges",
        baskets.filter(F.size("ps") >= 2)
        .select(F.explode(pair_combos).alias("e"))
        .select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
        .distinct())
    deg = fresh_persist(
        "tri_deg",
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node").agg(F.count("*").alias("d")))
    du = deg.select(F.col("node").alias("un"), F.col("d").alias("ud"))
    dv = deg.select(F.col("node").alias("vn"), F.col("d").alias("vd"))
    u_first = ((F.col("ud") < F.col("vd"))
               | ((F.col("ud") == F.col("vd")) & (F.col("u") < F.col("v"))))
    oriented = fresh_persist(
        "tri_oriented",
        edges.join(du, F.col("u") == F.col("un"))
        .join(dv, F.col("v") == F.col("vn"))
        .select(F.when(u_first, F.col("u")).otherwise(F.col("v"))
                .alias("src"),
                F.when(u_first, F.col("v")).otherwise(F.col("u"))
                .alias("dst")))
    # closure WITHOUT the wedge table: each triangle has exactly one
    # out-2 node x under the strict (degree, id) orientation (x->y,
    # x->z, y->z), so it is counted once at edge (x, y) as
    # z in N+(x) INTERSECT N+(y) — the oracle's wedge+edge-closure
    # count term for term. Per-edge arrays are out-neighborhoods,
    # <= O(sqrt(m)) elements under any skew, so no row is ever hub-
    # sized; the sum-d+^2-row wedge exchange and its 41 M-row sort
    # (sf0.1) are gone. Both arrays are duplicate-free (edges is
    # distinct), so array_intersect is exact set intersection; an
    # edge whose dst has no out-neighbors drops in the inner join
    # and contributes 0, and the empty-graph sum coalesces to 0
    # to match count(*)'s type and value.
    adj = oriented.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nb"))
    a1 = adj.select(F.col("src").alias("a1"), F.col("nb").alias("nb1"))
    a2 = adj.select(F.col("src").alias("a2"), F.col("nb").alias("nb2"))
    tri = (oriented.join(a1, F.col("src") == F.col("a1"))
           .join(a2, F.col("dst") == F.col("a2"))
           .select(F.size(F.array_intersect("nb1", "nb2")).alias("k"))
           .agg(F.coalesce(F.sum("k"), F.lit(0)).cast("long")
                .alias("n_triangles")))
    stats = (deg.agg(F.count("*").alias("n_nodes"),
                     F.sum(F.expr("(d * (d - 1)) div 2"))
                     .alias("n_wedges"))
             .crossJoin(edges.agg(F.count("*").alias("n_edges")))
             .crossJoin(tri))
    return stats.select("n_nodes", "n_edges", "n_wedges", "n_triangles")


_BFS_SRC = 0       # start nation for the BFS face
_BFS_HOPS = 4      # unrolled frontier rounds (graph diameter bound)
_BFS_FANOUT = 3    # top-k outgoing trade edges kept per nation


def _bfs_oracle() -> str:
    ctes = [f"""
    edges AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               CAST(COUNT(*) AS DOUBLE) AS w
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY w DESC, dst) AS rn
        FROM edges
    ),
    g AS (SELECT src, dst FROM ranked WHERE rn <= {_BFS_FANOUT}),
    d0 AS (SELECT {_BFS_SRC} AS node, 0 AS dist)"""]
    for t in range(_BFS_HOPS):
        ctes.append(f"""
    d{t + 1} AS (
        SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM d{t}
            UNION ALL
            SELECT g.dst AS node, d.dist + 1 AS dist
            FROM d{t} d JOIN g ON g.src = d.node
        ) GROUP BY node
    )""")
    return ("WITH " + ",".join(ctes) + f"""
    SELECT d.node AS nationkey, n.n_name AS nation,
           CAST(d.dist AS BIGINT) AS hops
    FROM d{_BFS_HOPS} d JOIN nation n ON n.n_nationkey = d.node
    """)


@query(
    "graph_bfs_hops",
    _bfs_oracle(),
    doc=f"BFS hop distance from nation {_BFS_SRC} over the SPARSIFIED trade "
        f"graph (each nation keeps its top-{_BFS_FANOUT} outgoing edges by "
        "trade volume, ties broken by destination id — deterministic). The "
        "fact tables aggregate ONCE into edges; sparsification is a "
        "per-source window top-k on that already-small edge list; each of "
        f"the {_BFS_HOPS} unrolled rounds is then frontier⋈edges + a "
        "MIN(dist) group-by, so per-round state is bounded by |V| and the "
        "min-dedup stops re-expansion of settled nodes — the standard "
        "Pregel-style BFS on DataFrames. All-integer arithmetic, "
        "hash-exact by construction; unreached nations are absent (no "
        "sentinel distance). The oracle unrolls the identical rounds as "
        "chained CTEs",
)
def graph_bfs_hops(spark, sf_dir):
    from pyspark.sql import Window

    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")

    edges = (li.join(o, li.l_orderkey == o.o_orderkey)
             .join(c, o.o_custkey == c.c_custkey)
             .join(s, li.l_suppkey == s.s_suppkey)
             .filter(F.col("c_nationkey") != F.col("s_nationkey"))
             .groupBy(F.col("c_nationkey").alias("src"),
                      F.col("s_nationkey").alias("dst"))
             .agg(F.count("*").cast("double").alias("w")))
    wn = Window.partitionBy("src").orderBy(F.desc("w"), F.asc("dst"))
    g = (edges.withColumn("rn", F.row_number().over(wn))
         .filter(F.col("rn") <= _BFS_FANOUT)
         .select("src", "dst")
         .cache())

    dist = spark.range(1).select(
        F.lit(_BFS_SRC).cast("long").alias("node"),
        F.lit(0).cast("int").alias("dist"))
    for _ in range(_BFS_HOPS):
        # single reference to `dist` per round: a naive
        # dist.unionAll(dist.join(g)) references the frontier TWICE, which
        # doubles the uncached lineage every round (2^hops plan blow-up —
        # measured 66 scans / 142 exchanges at 4 hops). The left join
        # keeps the carried row and the neighbor expansion in ONE pass:
        # unmatched nodes carry through, matched nodes emit themselves
        # plus each neighbor at dist+1, and MIN collapses duplicates.
        j = dist.join(g, dist.node == g.src, "left")
        keep = F.struct(F.col("node"), F.col("dist"))
        step = F.struct(F.col("dst").cast("long").alias("node"),
                        (F.col("dist") + 1).cast("int").alias("dist"))
        dist = (j.select(F.explode(F.when(F.col("dst").isNull(),
                                          F.array(keep))
                                   .otherwise(F.array(keep, step)))
                         .alias("p"))
                .select("p.node", "p.dist")
                .groupBy("node").agg(F.min("dist").alias("dist")))

    return (dist.join(F.broadcast(n), dist.node == n.n_nationkey)
            .select(F.col("node").alias("nationkey"),
                    F.col("n_name").alias("nation"),
                    F.col("dist").cast("bigint").alias("hops")))


@query(
    "graph_link_predict",
    """
    WITH wedges_raw AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
        GROUP BY 1, 2
    ),
    kept AS (
        SELECT src, dst FROM (
            SELECT src, dst,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY w DESC, dst) AS rn
            FROM wedges_raw
        ) WHERE rn <= 3
    ),
    und AS (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM kept
    ),
    sym AS (
        SELECT a AS node, b AS nbr FROM und
        UNION ALL SELECT b AS node, a AS nbr FROM und
    ),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM sym
            GROUP BY node),
    cn AS (
        SELECT s1.node AS a, s2.node AS b, CAST(COUNT(*) AS BIGINT)
                 AS n_common
        FROM sym s1 JOIN sym s2
          ON s1.nbr = s2.nbr AND s1.node < s2.node
        GROUP BY 1, 2
    )
    SELECT cn.a, cn.b, cn.n_common, da.d AS deg_a, db.d AS deg_b,
           ROUND(CAST(cn.n_common AS DOUBLE)
                 / CAST(da.d + db.d - cn.n_common AS DOUBLE), 6)
             AS jaccard
    FROM cn
    JOIN deg da ON da.node = cn.a
    JOIN deg db ON db.node = cn.b
    LEFT JOIN und e ON e.a = cn.a AND e.b = cn.b
    WHERE e.a IS NULL
    ORDER BY jaccard DESC, cn.a, cn.b
    """,
    doc="link prediction by neighborhood similarity: for every "
        "NON-adjacent nation pair in the undirected trade graph, the "
        "common-neighbor count and neighbor-set Jaccard — the classic "
        "who-should-trade-next candidate score. The 100 TB fact chain "
        "collapses ONCE to the distinct undirected edge set; common "
        "neighbors come from the wedge self-join of the symmetrized "
        "adjacency on the shared-neighbor key (work = sum of squared "
        "degrees of the GRAPH, never fact-sized), adjacency is excluded "
        "by an anti join on the edge set, and the Jaccard divides two "
        "exact integers (|N(a)∩N(b)| / |N(a)∪N(b)| via inclusion-"
        "exclusion) — hash-exact, no order pinning. On a hub-skewed "
        "graph the wedge join is the quadratic face; production runs cut "
        "it with a degree cap or sample, which would slot in as a filter "
        "on deg before the self-join",
)
def graph_link_predict(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    from pyspark.sql.window import Window

    wr = (li.join(o, li.l_orderkey == o.o_orderkey)
          .join(c, o.o_custkey == c.c_custkey)
          .join(s, li.l_suppkey == s.s_suppkey)
          .filter(F.col("c_nationkey") != F.col("s_nationkey"))
          .groupBy(F.col("c_nationkey").alias("src"),
                   F.col("s_nationkey").alias("dst"))
          .agg(F.count("*").cast("bigint").alias("w")))
    rn = F.row_number().over(
        Window.partitionBy("src").orderBy(F.desc("w"), F.asc("dst")))
    und = (wr.withColumn("rn", rn).filter(F.col("rn") <= 3)
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b"))
           .distinct()
           .cache())
    sym = (und.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
           .unionAll(und.select(F.col("b").alias("node"),
                                F.col("a").alias("nbr"))))
    deg = sym.groupBy("node").agg(F.count("*").cast("bigint").alias("d"))
    s1 = sym.select(F.col("node").alias("na"), "nbr")
    s2 = sym.select(F.col("node").alias("nb"), F.col("nbr").alias("nbr2"))
    cn = (s1.join(s2, (F.col("nbr") == F.col("nbr2"))
                  & (F.col("na") < F.col("nb")))
          .groupBy(F.col("na").alias("a"), F.col("nb").alias("b"))
          .agg(F.count("*").cast("bigint").alias("n_common")))
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("deg_b"))
    nonadj = cn.join(und, ["a", "b"], "left_anti")
    return (nonadj
            .join(F.broadcast(da), "a").join(F.broadcast(db), "b")
            .select("a", "b", "n_common", "deg_a", "deg_b",
                    F.round(F.col("n_common").cast("double")
                            / (F.col("deg_a") + F.col("deg_b")
                               - F.col("n_common")).cast("double"), 6)
                    .alias("jaccard"))
            .orderBy(F.desc("jaccard"), F.asc("a"), F.asc("b")))


@query(
    "graph_assortativity",
    """
    WITH lines AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    edges AS (
      SELECT DISTINCT a.pk AS u, b.pk AS v
      FROM lines a JOIN lines b ON a.ok = b.ok AND a.pk < b.pk
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
      ) GROUP BY node
    ),
    ends AS (
      SELECT du.d AS x, dv.d AS y FROM edges e
      JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
      UNION ALL
      SELECT dv.d AS x, du.d AS y FROM edges e
      JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
    ),
    s AS (
      SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS m,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
               AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
               AS DECIMAL(38,0)) AS sx2
      FROM ends
    )
    SELECT CAST(m AS BIGINT) // 2 AS n_edges,
           ROUND(CAST(m * sxy - sx * sx AS DOUBLE)
                 / CAST(m * sx2 - sx * sx AS DOUBLE), 6) AS assortativity
    FROM s WHERE m * sx2 > sx * sx
    """,
    doc="degree assortativity of the co-purchase part graph (Newman's r): "
        "the Pearson correlation of endpoint degrees over all edge "
        "orientations — positive means hubs link to hubs (social-network "
        "shape), negative means hub-and-spoke (infrastructure shape), "
        "~0 here (random co-purchase). The structural prior that decides "
        "whether degree-capped sampling (graph_link_predict's top-k cut) "
        "or degree-oriented joins (graph_triangles) will pay off on a "
        "given graph. Both orientations of each edge feed the closed "
        "form over four EXACT sums — symmetry makes Σy=Σx, so only m, "
        "Σx, Σxy, Σx² are needed — accumulated in DECIMAL(38,0) "
        "(degree² sums cross bigint on hub-heavy graphs). One number "
        "out, no order pinning, hash-exact; edges/degrees reuse the "
        "graph_triangles aggregation shape, so at 100 TB the only fact-"
        "scale work is the same distinct-pair rollup",
)
def graph_assortativity(spark, sf_dir):
    lines = (T(spark, sf_dir, "lineitem")
             .select(F.col("l_orderkey").alias("ok"),
                     F.col("l_partkey").alias("pk"))
             .distinct())
    b = lines.select(F.col("ok").alias("ok2"), F.col("pk").alias("pk2"))
    edges = (lines.join(b, (F.col("ok") == F.col("ok2"))
                        & (F.col("pk") < F.col("pk2")))
             .select(F.col("pk").alias("u"), F.col("pk2").alias("v"))
             .distinct()
             .cache())
    deg = (edges.select(F.col("u").alias("node"))
           .unionAll(edges.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count("*").cast("bigint").alias("d")))
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("dx"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dy"))
    joined = edges.join(du, "u").join(dv, "v")
    ends = (joined.select(F.col("dx").alias("x"), F.col("dy").alias("y"))
            .unionAll(joined.select(F.col("dy").alias("x"),
                                    F.col("dx").alias("y"))))
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    s = ends.agg(F.count("*").cast("decimal(38,0)").alias("m"),
                 F.sum(xd).cast("decimal(38,0)").alias("sx"),
                 F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
                 F.sum(xd * xd).cast("decimal(38,0)").alias("sx2"))
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sx")) \
        .cast("double")
    den = (F.col("m") * F.col("sx2") - F.col("sx") * F.col("sx")) \
        .cast("double")
    return (s.filter(F.col("m") * F.col("sx2")
                     > F.col("sx") * F.col("sx"))
            .select(F.expr("CAST(m AS BIGINT) div 2").alias("n_edges"),
                    F.round(num / den, 6).alias("assortativity")))


_LPA_ROUNDS = 4     # fixed synchronous rounds keep the oracle replayable
_LPA_FANOUT = 3     # same top-k sparsification as graph_bfs_hops


def _lpa_oracle() -> str:
    ctes = [f"""
    dedges AS MATERIALIZED (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               CAST(COUNT(*) AS DOUBLE) AS w
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src
                           ORDER BY w DESC, dst) AS rn
        FROM dedges
    ),
    und AS MATERIALIZED (
        SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        FROM ranked WHERE rn <= {_LPA_FANOUT}
    ),
    sym AS MATERIALIZED (
        SELECT u AS node, v AS nbr FROM und
        UNION ALL SELECT v AS node, u AS nbr FROM und
    ),
    l0 AS (SELECT DISTINCT node, node AS label FROM sym)"""]
    for t in range(_LPA_ROUNDS):
        ctes.append(f"""
    c{t + 1} AS (
        SELECT s.node, l.label, COUNT(*) AS c
        FROM sym s JOIN l{t} l ON l.node = s.nbr
        GROUP BY s.node, l.label
    ),
    l{t + 1} AS (
        SELECT node, label FROM (
            SELECT node, label,
                   ROW_NUMBER() OVER (PARTITION BY node
                                      ORDER BY c DESC, label ASC) AS rn
            FROM c{t + 1}
        ) WHERE rn = 1
    )""")
    return ("WITH " + ",".join(ctes) + f"""
    SELECT CAST(l.node AS BIGINT) AS nationkey, n.n_name AS nation,
           CAST(l.label AS BIGINT) AS community
    FROM l{_LPA_ROUNDS} l JOIN nation n ON n.n_nationkey = l.node
    ORDER BY nationkey
    """)


@query(
    "graph_label_propagation",
    _lpa_oracle(),
    doc=f"community detection by synchronous label propagation "
        f"(Raghavan et al. 2007) over the sparsified undirected trade "
        f"graph ({_LPA_ROUNDS} fixed rounds, top-{_LPA_FANOUT} fanout): "
        "every node starts labeled with its own id and each round adopts "
        "the most frequent label among its neighbors, ties broken by "
        "smallest label — the deterministic variant, so both engines "
        "replay the identical computation (async LPA is run-order-"
        "dependent and unverifiable cross-engine). Scale shape: the fact "
        "tables aggregate ONCE into the graph; each round is one "
        "labels⋈adjacency equi-join + a (node, label) count + a per-node "
        "argmax window — all keyed by node id, so every round is one "
        "shuffle of graph-sized (not fact-sized) rows, the same loop "
        "skeleton as graph_pagerank with the sum swapped for a mode. "
        "All-integer, hash-exact; the oracle unrolls the rounds as "
        "chained CTEs",
)
def graph_label_propagation(spark, sf_dir):
    from pyspark.sql import Window

    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")

    dedges = (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(c, o.o_custkey == c.c_custkey)
              .join(s, li.l_suppkey == s.s_suppkey)
              .filter(F.col("c_nationkey") != F.col("s_nationkey"))
              .groupBy(F.col("c_nationkey").alias("src"),
                       F.col("s_nationkey").alias("dst"))
              .agg(F.count("*").cast("double").alias("w")))
    wn = Window.partitionBy("src").orderBy(F.desc("w"), F.asc("dst"))
    und = (dedges.withColumn("rn", F.row_number().over(wn))
           .filter(F.col("rn") <= _LPA_FANOUT)
           .select(F.least("src", "dst").alias("u"),
                   F.greatest("src", "dst").alias("v"))
           .distinct())
    # sym feeds l0 plus one join per round — persist so the fact join
    # runs once (same rationale as graph_pagerank's cached contrib)
    from .core import fresh_persist
    sym = fresh_persist(
        "lpa_sym",
        und.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(und.select(F.col("v").alias("node"),
                             F.col("u").alias("nbr"))))

    labels = sym.select("node").distinct().withColumn(
        "label", F.col("node"))
    wv = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(_LPA_ROUNDS):
        lbl = labels.select(F.col("node").alias("lnode"), "label")
        cnt = (sym.join(lbl, sym.nbr == F.col("lnode"))
               .groupBy("node", "label").agg(F.count("*").alias("c")))
        labels = (cnt.withColumn("rn", F.row_number().over(wv))
                  .filter(F.col("rn") == 1)
                  .select("node", "label"))

    return (labels.join(F.broadcast(n), labels.node == n.n_nationkey)
            .select(F.col("node").cast("bigint").alias("nationkey"),
                    F.col("n_name").alias("nation"),
                    F.col("label").cast("bigint").alias("community"))
            .orderBy("nationkey"))


_KCORE_KMAX = 4     # coreness cap; fixture max coreness is 3 (margin test)
_KCORE_ROUNDS = 5   # bounded peel rounds per k; fixture converges by 3
_KCORE_FANOUT = 3   # same top-k sparsification as graph_bfs_hops


def _kcore_oracle() -> str:
    ctes = [f"""
    dedges AS MATERIALIZED (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               CAST(COUNT(*) AS DOUBLE) AS w
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src
                           ORDER BY w DESC, dst) AS rn
        FROM dedges
    ),
    e0 AS MATERIALIZED (
        SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        FROM ranked WHERE rn <= {_KCORE_FANOUT}
    )"""]
    sv = []
    for k in range(1, _KCORE_KMAX + 1):
        cur = "e0"
        for r in range(_KCORE_ROUNDS):
            ctes.append(f"""
    k{k}a{r} AS (
        SELECT node FROM (
            SELECT node, COUNT(*) AS c
            FROM (SELECT u AS node FROM {cur}
                  UNION ALL SELECT v FROM {cur}) t GROUP BY node
        ) d WHERE c >= {k}
    ),
    k{k}e{r + 1} AS MATERIALIZED (
        SELECT e.u, e.v FROM {cur} e
        JOIN k{k}a{r} x ON x.node = e.u
        JOIN k{k}a{r} y ON y.node = e.v
    )""")
            cur = f"k{k}e{r + 1}"
        ctes.append(f"""
    sv{k} AS (SELECT u AS node FROM {cur} UNION SELECT v FROM {cur})""")
        sv.append(f"SELECT node FROM sv{k}")
    return ("WITH " + ",".join(ctes) + f""",
    core AS (
        SELECT node, COUNT(*) AS coreness
        FROM ({" UNION ALL ".join(sv)}) allk GROUP BY node
    )
    SELECT CAST(n.n_nationkey AS BIGINT) AS nationkey,
           n.n_name AS nation,
           CAST(COALESCE(core.coreness, 0) AS BIGINT) AS coreness
    FROM nation n LEFT JOIN core ON core.node = n.n_nationkey
    ORDER BY nationkey
    """)


@query(
    "graph_kcore_peel",
    _kcore_oracle(),
    doc=f"per-nation CORENESS (max k with the node in the k-core) of the "
        f"sparsified trade graph — the density stratification that picks "
        "candidate hubs before expensive per-node analytics (the "
        "standard triage before community detection or fraud scoring). "
        f"Peeling: for each k in 1..{_KCORE_KMAX}, {_KCORE_ROUNDS} "
        "BOUNDED rounds of degree-filter-and-induce (degree groupBy -> "
        "alive >= k -> two semi-joins), survivors = nodes of the final "
        "edge set; coreness = how many k-chains a node survives (cores "
        "nest, so the count IS the max). Bounded rounds keep both "
        "engines on the identical computation whether or not the peel "
        "has converged (fixture converges by round 3 — margin-tested); "
        "at web scale the loop is the same shape as dedup_components "
        "and would run to fixpoint with the identical per-round "
        "hygiene, which this face reuses: the fact tables aggregate "
        "ONCE into the graph (the only 100 TB-sized work, "
        "localCheckpoint'ed so 20 peel rounds re-read materialized "
        "blocks instead of re-deriving the 4-table join), each round "
        "is eagerly checkpointed so lineage stays O(1) — a naive lazy "
        "chain references the previous round ~5x per round and the "
        "PLAN grows 5^rounds — and superseded rounds' blocks are freed "
        "via the internal-RDD handle (DataFrame.unpersist does not "
        "free localCheckpoint blocks). All-integer arithmetic, "
        "hash-exact by construction. The oracle unrolls the identical "
        "rounds as chained MATERIALIZED CTEs (inlined, DuckDB would "
        "re-execute the fact join per reference)",
)
def graph_kcore_peel(spark, sf_dir):
    from pyspark.sql import Window

    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")

    def _chk_rdd(df):
        plan = df._jdf.queryExecution().analyzed()
        try:
            return plan.rdd()
        except Exception:
            return None

    dedges = (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(c, o.o_custkey == c.c_custkey)
              .join(s, li.l_suppkey == s.s_suppkey)
              .filter(F.col("c_nationkey") != F.col("s_nationkey"))
              .groupBy(F.col("c_nationkey").alias("src"),
                       F.col("s_nationkey").alias("dst"))
              .agg(F.count("*").cast("double").alias("w")))
    wn = Window.partitionBy("src").orderBy(F.desc("w"), F.asc("dst"))
    e0 = (dedges.withColumn("rn", F.row_number().over(wn))
          .filter(F.col("rn") <= _KCORE_FANOUT)
          .select(F.least("src", "dst").alias("u"),
                  F.greatest("src", "dst").alias("v"))
          .distinct()
          .localCheckpoint())   # fact join runs ONCE for all 20 rounds

    surv = []
    for k in range(1, _KCORE_KMAX + 1):
        e = e0
        prev_rdd = None
        for _ in range(_KCORE_ROUNDS):
            deg = (e.select(F.col("u").alias("node"))
                   .unionAll(e.select(F.col("v").alias("node")))
                   .groupBy("node").agg(F.count("*").alias("c")))
            alive = deg.filter(F.col("c") >= k).select("node")
            e = (e.join(alive.withColumnRenamed("node", "u"), "u", "semi")
                 .join(alive.withColumnRenamed("node", "v"), "v", "semi")
                 .localCheckpoint())
            if prev_rdd is not None:   # superseded round's blocks
                prev_rdd.unpersist(False)
            prev_rdd = _chk_rdd(e)
        surv.append(e.select(F.col("u").alias("node"))
                    .unionAll(e.select(F.col("v").alias("node")))
                    .distinct())
    allk = surv[0]
    for df in surv[1:]:
        allk = allk.unionAll(df)
    core = allk.groupBy("node").agg(
        F.count("*").cast("bigint").alias("coreness"))
    return (n.join(F.broadcast(core), n.n_nationkey == core.node, "left")
            .select(F.col("n_nationkey").cast("bigint").alias("nationkey"),
                    F.col("n_name").alias("nation"),
                    F.coalesce("coreness", F.lit(0)).cast("bigint")
                    .alias("coreness"))
            .orderBy("nationkey"))


_WCC_ROUNDS = 8    # alternating large/small-star rounds; fixture converges
                   # by round 5 (margin test in test_round9_faces.py)
_WCC_MOD = 16      # deterministic edge sparsifier: (u*31 + v) % mod == 0


def _wcc_edges_sql() -> str:
    return f"""
    ln AS (SELECT l_orderkey AS ok, l_linenumber AS lnum,
                  l_partkey AS pk FROM lineitem),
    chain AS (
      SELECT a.pk AS x, b.pk AS y FROM ln a JOIN ln b
        ON a.ok = b.ok AND b.lnum = a.lnum + 1
    ),
    e AS (
      SELECT DISTINCT LEAST(x, y) AS u, GREATEST(x, y) AS v
      FROM chain
      WHERE x <> y AND (LEAST(x, y) * 31 + GREATEST(x, y)) % {_WCC_MOD} = 0
    )"""


@query(
    "graph_wcc_star",
    f"""
    WITH RECURSIVE {_wcc_edges_sql()},
    edges AS (SELECT u AS src, v AS dst FROM e
              UNION ALL SELECT v, u FROM e),
    nodes AS (SELECT DISTINCT src AS n FROM edges),
    reach(n, r) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT ed.dst, reach.r FROM reach JOIN edges ed ON ed.src = reach.n
    ),
    comp AS (SELECT n, MIN(r) AS c FROM reach GROUP BY n)
    SELECT CAST(n AS BIGINT) AS node, CAST(c AS BIGINT) AS component,
           CAST(COUNT(*) OVER (PARTITION BY c) AS BIGINT)
             AS component_size
    FROM comp
    """,
    doc=f"connected components via ALTERNATING LARGE-STAR/SMALL-STAR "
        f"contraction (Kiveris et al. 2014), {_WCC_ROUNDS} bounded "
        "rounds — the O(log n)-round CC algorithm for graphs whose "
        "diameter makes per-round min-label propagation "
        "(dedup_components' loop, O(diameter) rounds) too slow at "
        "scale. Graph: the part co-purchase CHAIN graph (consecutive "
        "lineitem lines within an order), deterministically sparsified "
        f"by (u*31+v) % {_WCC_MOD} so components are many and "
        "multi-hop (sf0.01: 1677 nodes, 85 components, largest 111). "
        "Each round: LARGE-STAR hangs every strictly-larger neighbor "
        "of u onto min(N(u) ∪ u) — one groupBy-min + join on the "
        "doubled edge list; SMALL-STAR re-hangs each hub's "
        "smaller-neighborhood onto its min — one groupBy-min + join "
        "on the canonical (u<v) list. Edges localCheckpoint per round "
        "with superseded blocks freed (the k-core lineage hygiene: a "
        "lazy chain would grow the plan exponentially). The ORACLE is "
        "the ground-truth min-reachable-id fixpoint (DuckDB recursive "
        "CTE) — the hash match therefore proves the bounded rounds "
        "actually CONVERGED to true components, not merely that two "
        "engines replayed the same partial state; the convergence "
        "margin (fixture converges by round 5 of 8) is pinned in "
        "test_round9_faces.py. At 100 TB: rounds grow as log n, each "
        "round two node-keyed shuffles on the (shrinking) edge list, "
        "and the fact tables aggregate once into the graph up front",
)
def graph_wcc_star(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_linenumber").alias("lnum"),
        F.col("l_partkey").alias("pk"))
    b = li.select(F.col("ok").alias("ok2"), F.col("lnum").alias("lnum2"),
                  F.col("pk").alias("pk2"))
    chain = li.join(b, (F.col("ok") == F.col("ok2"))
                    & (F.col("lnum2") == F.col("lnum") + 1))
    u = F.least("pk", "pk2")
    v = F.greatest("pk", "pk2")
    edges = (chain.filter(F.col("pk") != F.col("pk2"))
             .select(u.alias("u"), v.alias("v"))
             .filter((F.col("u") * 31 + F.col("v")) % _WCC_MOD == 0)
             .distinct()
             .localCheckpoint())      # fact join runs once

    def _chk_rdd(df):
        try:
            return df._jdf.queryExecution().analyzed().rdd()
        except Exception:
            return None

    prev_rdd = None
    for _ in range(_WCC_ROUNDS):
        # LARGE-STAR on the doubled list: m(a) = min(min_nbr(a), a);
        # emit (b, m) for neighbors b > a (m <= a < b, never a self-loop)
        dbl = (edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
               .unionAll(edges.select(F.col("v").alias("a"),
                                      F.col("u").alias("b"))))
        mins = (dbl.groupBy("a")
                .agg(F.least(F.min("b"), F.first("a")).alias("m")))
        large = (dbl.join(mins, "a").filter(F.col("b") > F.col("a"))
                 .select(F.least("b", "m").alias("u"),
                         F.greatest("b", "m").alias("v"))
                 .distinct())
        # SMALL-STAR on the canonical list: hub v's strictly-smaller
        # neighborhood N; m = min(N); emit (x, m) for x in N∪{v}, x != m
        sm = large.groupBy("v").agg(F.min("u").alias("m"))
        small = (large.join(sm, "v")
                 .filter(F.col("u") != F.col("m"))
                 .select(F.least("u", "m").alias("u"),
                         F.greatest("u", "m").alias("v"))
                 .unionAll(sm.select(F.col("m").alias("u"),
                                     F.col("v").alias("v")))
                 .distinct())
        edges = small.localCheckpoint()
        if prev_rdd is not None:
            prev_rdd.unpersist(False)
        prev_rdd = _chk_rdd(edges)

    dbl = (edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
           .unionAll(edges.select(F.col("v").alias("a"),
                                  F.col("u").alias("b"))))
    from pyspark.sql import Window
    lab = (dbl.groupBy("a")
           .agg(F.least(F.min("b"), F.first("a")).alias("component"))
           .select(F.col("a").cast("bigint").alias("node"),
                   F.col("component").cast("bigint").alias("component")))
    return lab.withColumn(
        "component_size",
        F.count("*").over(Window.partitionBy("component")).cast("bigint"))
