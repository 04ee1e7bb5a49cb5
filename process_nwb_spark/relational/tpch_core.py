"""Core relational operator surface (SURVEY.md §2C) on the TPC-H-ish tables.

Each entry is an idiomatic DataFrame program; the paired oracle is ANSI SQL
DuckDB runs on the same parquet. Scale notes are inline: broadcast the
dimension side of every star join, let AQE pick shuffle partition counts,
keep aggregates partial-agg friendly (no driver-side collects).
"""
from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .core import T, dim_broadcast, query


# --------------------------------------------------------------------------
# Projection / filter / CASE / IN / BETWEEN / LIKE / null predicates
# --------------------------------------------------------------------------
@query(
    "proj_filter_case",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS net_price,
           CASE WHEN l_quantity >= 30 THEN 'bulk'
                WHEN l_quantity >= 10 THEN 'mid'
                ELSE 'small' END AS qty_class,
           (l_returnflag = 'R') AS returned
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
      AND l_quantity BETWEEN 5 AND 45
      AND l_linestatus LIKE 'F%'
      AND l_discount IS NOT NULL
    """,
    doc="projection, CASE WHEN, IN, BETWEEN, LIKE, null predicate; filters "
        "push down to the parquet scan (PushedFilters)",
)
def proj_filter_case(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_returnflag").isin("A", "R")
            & F.col("l_quantity").between(5, 45)
            & F.col("l_linestatus").like("F%")
            & F.col("l_discount").isNotNull()
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("double").alias("net_price"),
            F.when(F.col("l_quantity") >= 30, "bulk")
            .when(F.col("l_quantity") >= 10, "mid")
            .otherwise("small").alias("qty_class"),
            (F.col("l_returnflag") == "R").alias("returned"),
        )
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------
@query(
    "join_inner_broadcast",
    """
    SELECT n.n_name AS nation, r.r_name AS region,
           ROUND(SUM(CAST(o.o_totalprice AS DOUBLE)), 2) AS revenue,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    doc="star join: facts joined to broadcast dims (customer/nation/region), "
        "hash aggregate on top",
)
def join_inner_broadcast(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    return (
        o.join(dim_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"), r.r_name.alias("region"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("double")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "join_sortmerge_large",
    """
    SELECT o.o_orderpriority,
           ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DOUBLE)), 2)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    """,
    doc="fact-fact equi-join with an explicit sort-merge hint: both sides "
        "are large at 100 TB, so the right plan is shuffle-on-key SMJ (or "
        "shuffled hash), never a broadcast of a fact table. The status "
        "filter is pushed into the orders scan before the shuffle. "
        "Co-located (shuffle-free) variants via bucketed tables are in "
        "sources/catalog.py write_bucketed + tests/test_sources.py",
)
def join_sortmerge_large(spark, sf_dir):
    # r14 optimization (guide §2.3 "aggregate before you shuffle"): the
    # per-order partial aggregation is pushed BELOW the join. Each order
    # has exactly one priority, so revenue-per-priority = sum of
    # per-order subtotals and n_lines = sum of per-order line counts —
    # the lineitem side's exchange now carries one combined row per
    # orderkey (map-side combine, ~4x fewer shuffled rows) instead of
    # every line, and the aggregation lands partitioned on l_orderkey,
    # which is exactly the SMJ's required distribution — the join adds
    # NO further exchange for that side. Float note: this regroups the
    # double summation; the committed hash gate already proves the
    # ROUND(.,2) result is stable under summation reorder (HASHSTAB runs
    # the old plan at 7 and 64 partitions), re-proven at all three SFs
    # after this change.
    li = T(spark, sf_dir, "lineitem")
    per_order = (li.groupBy("l_orderkey")
                 .agg(F.sum((F.col("l_extendedprice")
                             * (1 - F.col("l_discount"))).cast("double"))
                      .alias("_rev"),
                      F.count(F.lit(1)).alias("_n")))
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        per_order.join(o.hint("merge"),
                       per_order.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum("_rev"), 2).alias("revenue"),
             F.sum("_n").alias("n_lines"))
    )


@query(
    "join_left_coalesce",
    """
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(CAST(o.o_totalprice AS DOUBLE)), 0.0), 2) AS spend
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    doc="left outer join preserving customers without orders; COUNT of a "
        "nullable key + COALESCE",
)
def join_left_coalesce(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum(F.col("o_totalprice").cast("double")),
                               F.lit(0.0)), 2).alias("spend"),
        )
    )


@query(
    "join_right",
    """
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation
    FROM nation n
    RIGHT JOIN supplier s ON s.s_nationkey = n.n_nationkey
    """,
    doc="right outer join (dim side preserved)",
)
def join_right(spark, sf_dir):
    n = T(spark, sf_dir, "nation")
    s = T(spark, sf_dir, "supplier")
    return (
        n.join(s, s.s_nationkey == n.n_nationkey, "right")
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


@query(
    "join_full_outer",
    """
    SELECT COALESCE(cu.k, su.k) AS nationkey,
           COALESCE(cu.n_cust, 0) AS n_cust,
           COALESCE(su.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) cu
    FULL JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) su
      ON cu.k = su.k
    """,
    doc="full outer join of two aggregates with COALESCE over both sides",
)
def join_full_outer(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    cu = c.groupBy(F.col("c_nationkey").alias("k")).agg(F.count("*").alias("n_cust"))
    su = s.groupBy(F.col("s_nationkey").alias("k")).agg(F.count("*").alias("n_supp"))
    return (
        cu.join(su, "k", "full")
        .select(
            F.col("k").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "join_semi",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
    doc="left semi join (EXISTS)",
)
def join_semi(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name")


@query(
    "join_anti",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    """,
    doc="left anti join (NOT EXISTS) with a filtered right side: "
        "customers with no order above 300k. (The unfiltered variant "
        "matched EVERY customer in the fixture — a vacuous 0==0 hash "
        "check; the filter makes the anti-join output real while "
        "keeping the same plan shape)",
)
def join_anti(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = (T(spark, sf_dir, "orders")
         .filter(F.col("o_totalprice") > 300000))
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name")


@query(
    "join_cross",
    """
    SELECT r.r_name AS region, et.event_type, et.n_events
    FROM region r
    CROSS JOIN (SELECT event_type, COUNT(*) AS n_events
                FROM events GROUP BY event_type) et
    """,
    doc="cross join of two small relations (5 x 5)",
)
def join_cross(spark, sf_dir):
    r = T(spark, sf_dir, "region")
    et = (T(spark, sf_dir, "events")
          .groupBy("event_type").agg(F.count("*").alias("n_events")))
    return r.crossJoin(et).select(F.col("r_name").alias("region"),
                                  "event_type", "n_events")


@query(
    "join_range_bucket",
    """
    SELECT b.bucket, COUNT(*) AS n_parts,
           ROUND(AVG(CAST(p.p_retailprice AS DOUBLE)), 2) AS avg_price
    FROM part p
    JOIN (VALUES ('tiny', 0, 10), ('small', 10, 25), ('large', 25, 50),
                 ('huge', 50, 2000000000)) AS b(bucket, lo, hi)
      ON p.p_size >= b.lo AND p.p_size < b.hi
    GROUP BY b.bucket
    """,
    doc="non-equi (range/theta) join against a broadcast bucket dim",
)
def join_range_bucket(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    b = spark.createDataFrame(
        [("tiny", 0, 10), ("small", 10, 25), ("large", 25, 50),
         ("huge", 50, 2_000_000_000)],
        "bucket STRING, lo INT, hi INT")
    return (
        p.join(F.broadcast(b), (p.p_size >= b.lo) & (p.p_size < b.hi))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_parts"),
             F.round(F.avg(F.col("p_retailprice").cast("double")), 2)
             .alias("avg_price"))
    )


@query(
    "join_asof",
    """
    WITH ranked AS (
      SELECT e.event_id, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, o_orderkey AS asof_orderkey,
           CAST(o_totalprice AS DOUBLE) AS asof_totalprice
    FROM ranked WHERE rn = 1
    """,
    doc="as-of join: each event matched to the user's most recent order as "
        "of event time. The argmax over (o_orderdate, o_orderkey) is packed "
        "into ONE BIGINT (days*1e10 + orderkey) so the aggregate is a "
        "plain max() — HashAggregate with map-side partials (max_by over a "
        "struct would force SortAggregate: variable/struct agg buffers "
        "aren't hash-aggregable). The shuffle then carries one BIGINT per "
        "(event, map partition) instead of every matched order row sorted "
        "in a window; totalprice is recovered via a broadcast join on the "
        "decoded orderkey. Oracle states the same semantics as window top-1",
)
def join_asof(spark, sf_dir):
    # r14 optimization (guide §3.3 — explode/fan-out joins): the previous
    # plan theta-joined events x orders on (custkey, date <= ts), blowing
    # each event up to EVERY earlier order of its customer, re-aggregated
    # that fan-out by event_id (a second big exchange), then broadcast
    # the FULL orders dim for the price attach — unconditional broadcast
    # of a fact table, a 100 TB scale hole. Now the orders side collapses
    # FIRST to one row per customer carrying a packed (date,key,price)
    # struct array (|orders-per-customer|-bounded, ~10 in TPC-H), the
    # events side joins 1:1 on custkey, and the as-of pick is a row-local
    # array scan: filter date <= ts, array_max on the packed integer.
    # No fan-out row ever materializes, no event-keyed re-shuffle, no
    # fact-table broadcast. Determinism unchanged: the argmax key is the
    # same exact-integer (date, orderkey) packing.
    e = T(spark, sf_dir, "events")
    o = T(spark, sf_dir, "orders")
    # (date, key) order-preserving integer packing: orderkey < 1e10
    packed = (F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
              .cast("bigint") * F.lit(10_000_000_000).cast("bigint")
              + F.col("o_orderkey"))
    per_cust = (o.groupBy("o_custkey")
                .agg(F.collect_list(F.struct(
                    packed.alias("pk"),
                    F.col("o_orderdate").alias("d"),
                    F.col("o_totalprice").cast("double").alias("p")))
                    .alias("_orders")))
    best = F.array_max(F.transform(
        F.filter("_orders", lambda s: s["d"] <= F.col("ts")),
        lambda s: F.struct(s["pk"].alias("pk"), s["p"].alias("p"))))
    return (e.join(per_cust, e.user_id == per_cust.o_custkey)
            .select("event_id", best.alias("_b"))
            .filter(F.col("_b").isNotNull())
            .select("event_id",
                    (F.col("_b.pk") % F.lit(10_000_000_000).cast("bigint"))
                    .alias("asof_orderkey"),
                    F.col("_b.p").alias("asof_totalprice")))


@query(
    "join_interval_bucketed",
    """
    WITH cents AS (
      SELECT o_orderkey, CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS t
      FROM orders
    ),
    q AS (
      SELECT CAST(MIN(t) AS BIGINT) AS q0,
             CAST(PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY t) AS BIGINT) AS q1,
             CAST(PERCENTILE_DISC(0.50) WITHIN GROUP (ORDER BY t) AS BIGINT) AS q2,
             CAST(PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY t) AS BIGINT) AS q3,
             CAST(MAX(t) + 1 AS BIGINT) AS q4
      FROM cents
    ),
    bands AS (
      SELECT 0 AS band, q0 AS lo, q1 AS hi FROM q
      UNION ALL SELECT 1, q1, q2 FROM q
      UNION ALL SELECT 2, q2, q3 FROM q
      UNION ALL SELECT 3, q3, q4 FROM q
    )
    SELECT b.band,
           CAST(b.lo AS BIGINT) AS lo, CAST(b.hi AS BIGINT) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(c.t) AS BIGINT) AS sum_cents
    FROM cents c JOIN bands b ON c.t >= b.lo AND c.t < b.hi
    GROUP BY b.band, b.lo, b.hi
    ORDER BY band
    """,
    doc="RANGE (interval) join with the bucketing optimization: orders "
        "joined to quartile price bands by t in [lo, hi). The oracle "
        "states the plain BETWEEN join; the Spark plan does what a range "
        "join must do at 100 TB — each band EXPLODES into the uniform "
        "buckets it covers (sequence(lo div W, (hi-1) div W), interval-"
        "table-sized x O(span/W)), the probe side maps to its single "
        "bucket with pure integer arithmetic, and the join is an "
        "EQUI-join on bucket plus the residual range predicate, so no "
        "nested-loop scan of probe x intervals ever happens (the naive "
        "theta join is BroadcastNestedLoop — fine for 4 bands, a "
        "job-killer when the interval table is a million IP ranges / "
        "time intervals; plan-gated in test_plans.py). Band boundaries "
        "are integer-cent ORDER STATISTICS (PERCENTILE_DISC on BIGINT) "
        "and all outputs exact integer sums — no float boundary can "
        "flip membership between engines",
)
def join_interval_bucketed(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    cents = o.select(
        F.round(F.col("o_totalprice") * 100.0, 0).cast("bigint").alias("t"))
    q = cents.agg(
        F.min("t").cast("bigint").alias("q0"),
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY t)")
        .cast("bigint").alias("q1"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY t)")
        .cast("bigint").alias("q2"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY t)")
        .cast("bigint").alias("q3"),
        (F.max("t") + 1).cast("bigint").alias("q4"))
    bands = (q.select(F.explode(F.array(
        F.struct(F.lit(0).alias("band"), F.col("q0").alias("lo"),
                 F.col("q1").alias("hi")),
        F.struct(F.lit(1).alias("band"), F.col("q1").alias("lo"),
                 F.col("q2").alias("hi")),
        F.struct(F.lit(2).alias("band"), F.col("q2").alias("lo"),
                 F.col("q3").alias("hi")),
        F.struct(F.lit(3).alias("band"), F.col("q3").alias("lo"),
                 F.col("q4").alias("hi")))).alias("b"))
        .select("b.band", "b.lo", "b.hi"))
    # bucket width: coarse enough that each band covers O(16) buckets,
    # never 0 (GREATEST), computed from the same exact quartile row
    width = (q.select(F.greatest(
        ((F.col("q4") - F.col("q0")) / F.lit(64)).cast("bigint"),
        F.lit(1)).alias("w")))
    covered = (bands.crossJoin(F.broadcast(width))
               .select("band", "lo", "hi",
                       F.explode(F.sequence(
                           F.expr("lo div w"),
                           F.expr("(hi - 1) div w"))).alias("bucket")))
    probe = (cents.crossJoin(F.broadcast(width))
             .select("t", F.expr("t div w").alias("bucket")))
    return (probe.join(F.broadcast(covered), "bucket")
            .filter((F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi")))
            .groupBy("band", "lo", "hi")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                 F.sum("t").cast("bigint").alias("sum_cents"))
            .select("band", "lo", "hi", "n_orders", "sum_cents")
            .orderBy("band"))


# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------
@query(
    "agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(CAST(l_quantity AS DOUBLE)), 2) AS sum_qty,
           ROUND(SUM(CAST(l_extendedprice AS DOUBLE)), 2) AS sum_base_price,
           ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE)), 2) AS sum_disc_price,
           ROUND(AVG(CAST(l_quantity AS DOUBLE)), 4) AS avg_qty,
           ROUND(AVG(CAST(l_discount AS DOUBLE)), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: multi-aggregate hash agg with "
        "map-side partial aggregation",
)
def agg_pricing_summary(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("double")), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("double")), 2)
            .alias("sum_base_price"),
            F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                          .cast("double")), 2).alias("sum_disc_price"),
            F.round(F.avg(F.col("l_quantity").cast("double")), 4).alias("avg_qty"),
            F.round(F.avg(F.col("l_discount").cast("double")), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_salted_skew",
    """
    SELECT l_returnflag,
           ROUND(SUM(CAST(l_extendedprice AS DOUBLE)), 2) AS total_price,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="salted two-phase aggregation for skewed keys: l_returnflag has 3 "
        "distinct values, so a naive groupBy funnels 1/3 of a 100 TB table "
        "through 3 reducers. Phase 1 aggregates on (key, salt16) spreading "
        "each hot key over 16 reducers; phase 2 merges the 3x16 partials. "
        "Salt is deterministic (l_orderkey % 16) so the oracle is the "
        "plain aggregate. (AQE skew-join handles the join-side analog "
        "automatically; salting is the agg-side pattern.)",
)
def agg_salted_skew(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    phase1 = (
        li.withColumn("_salt", (F.col("l_orderkey") % 16).cast("int"))
        .groupBy("l_returnflag", "_salt")
        .agg(F.sum(F.col("l_extendedprice").cast("double")).alias("_p"),
             F.sum(F.col("l_quantity").cast("bigint")).alias("_q"),
             F.count(F.lit(1)).alias("_n"))
    )
    return (
        phase1.groupBy("l_returnflag")
        .agg(F.round(F.sum("_p"), 2).alias("total_price"),
             F.sum("_q").cast("bigint").alias("total_qty"),
             F.sum("_n").alias("n_rows"))
    )


@query(
    "agg_count_distinct",
    """
    SELECT c_nationkey,
           COUNT(DISTINCT c_mktsegment) AS n_segments,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_nationkey
    """,
    doc="exact distinct aggregation (expand + two-phase agg in Spark)",
)
def agg_count_distinct(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.count_distinct("c_mktsegment").alias("n_segments"),
        F.count("*").alias("n_customers"),
    )


@query(
    "agg_approx_count_distinct",
    """
    SELECT o_orderstatus, 1 AS approx_ok
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="approx_count_distinct (HyperLogLog++). The sketch value itself "
        "isn't replayable in DuckDB, so the oracled contract is the "
        "tolerance: per group, |approx - exact| <= 3*rsd*exact "
        "(rsd=0.05 default -> 15%, a 3-sigma bound). The Spark side "
        "computes both estimates and emits the boolean; the oracle "
        "asserts TRUE per group.",
)
def agg_approx_count_distinct(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return (o.groupBy("o_orderstatus")
            .agg(F.approx_count_distinct("o_custkey").alias("approx"),
                 F.count_distinct("o_custkey").alias("exact"))
            .select("o_orderstatus",
                    (F.abs(F.col("approx") - F.col("exact"))
                     <= 0.15 * F.col("exact")).cast("int")
                    .alias("approx_ok")))


@query(
    "agg_trimmed_mean",
    """
    WITH ranked AS (
      SELECT l_returnflag, l_quantity,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           ROUND(AVG(CAST(l_quantity AS DOUBLE)), 4) AS trimmed_mean_qty
    FROM ranked
    WHERE rn > CAST(CEIL(n * 0.025) AS BIGINT)
      AND rn <= n - CAST(CEIL(n * 0.025) AS BIGINT)
    GROUP BY l_returnflag
    """,
    doc="the CAR operator's trimmed mean (mean_frac=0.95, ceil-per-side — "
        "common_referencing.py:37) as a relational aggregate over LARGE "
        "groups: window rank + count, trim the ceil-per-side tails, avg. "
        "l_returnflag has only 3 groups, so the collect_list/sort_array "
        "form (right for CAR's bounded per-sample groups, see "
        "sig_car_subtract) would materialize whole groups in memory; the "
        "window form sorts spill-safely and the post-window groupBy "
        "reuses the same partitioning — one exchange total. At extreme "
        "per-group cardinality the next step is approx-percentile "
        "bounds + a filtered avg, trading exactness for a scan",
)
def agg_trimmed_mean(spark, sf_dir):
    # Value-HISTOGRAM selection (r14 optimization; the
    # agg_exact_median_selection idiom): l_quantity is a bounded integer
    # domain (1..50 at every SF — TPC-H spec), so the rank-trim collapses
    # onto the (flag, quantity) count table. The oracle's row_number trim
    # drops the ceil(n*0.025) extreme ROWS per side, but rows tied on
    # l_quantity are interchangeable for AVG(l_quantity) — the kept
    # MULTISET of quantities is exactly the clamped-overlap of each
    # value's rank run [cum-cnt, cum) with the kept band [n_excl, n-n_excl)
    # — so summing kept_k * q is value-identical to averaging the kept
    # rows. Exactness: q is an integral double, kept counts are integers,
    # so every partial sum is an exact integer < 2^53 in EITHER
    # formulation — same dividend, same divisor, same double division,
    # same ROUND. The window form this replaces shuffled the full table
    # into |flags|=3 single-task sort partitions (the 100 TB straggler
    # shape); this plan is one map-side-combined hash-agg to <=150 rows,
    # then metadata-sized windows above the aggregate (house rule).
    li = T(spark, sf_dir, "lineitem")
    hist = (li.groupBy("l_returnflag",
                       F.col("l_quantity").cast("double").alias("q"))
            .agg(F.count("*").alias("cnt")))
    wf = Window.partitionBy("l_returnflag")
    wo = wf.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    h = (hist.withColumn("n", F.sum("cnt").over(wf))
         .withColumn("cum", F.sum("cnt").over(wo)))
    n_excl = F.ceil(F.col("n") * F.lit(0.025)).cast("bigint")
    lo = F.greatest(F.col("cum") - F.col("cnt"), n_excl)
    hi = F.least(F.col("cum"), F.col("n") - n_excl)
    kept = F.greatest(hi - lo, F.lit(0).cast("bigint"))
    return (h.groupBy("l_returnflag")
            .agg(F.sum(kept.cast("double") * F.col("q")).alias("_s"),
                 F.sum(kept).alias("_k"))
            # a fully-trimmed group (2*n_excl >= n, only possible at n<=1)
            # emits NO row in the rank formulation; match it exactly
            .filter(F.col("_k") > 0)
            .select("l_returnflag",
                    F.round(F.col("_s") / F.col("_k").cast("double"), 4)
                    .alias("trimmed_mean_qty")))


@query(
    "agg_stats",
    """
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(CAST(l_extendedprice AS DOUBLE)), 2) AS sd_price,
           ROUND(STDDEV_POP(CAST(l_extendedprice AS DOUBLE)), 2) AS sdp_price,
           ROUND(QUANTILE_CONT(CAST(l_extendedprice AS DOUBLE), 0.5), 2) AS median_price,
           ROUND(MIN(CAST(l_extendedprice AS DOUBLE)), 2) AS min_price,
           ROUND(MAX(CAST(l_extendedprice AS DOUBLE)), 2) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="stddev_samp/pop + exact interpolated median (percentile) + min/max",
)
def agg_stats(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp(p), 2).alias("sd_price"),
        F.round(F.stddev_pop(p), 2).alias("sdp_price"),
        F.round(F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.5)"), 2)
        .alias("median_price"),
        F.round(F.min(p), 2).alias("min_price"),
        F.round(F.max(p), 2).alias("max_price"),
    )


@query(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
           COUNT(*) AS n, ROUND(SUM(CAST(l_quantity AS DOUBLE)), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP with GROUPING() markers",
)
def agg_rollup(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.grouping("l_returnflag").cast("long").alias("g_flag"),
             F.grouping("l_linestatus").cast("long").alias("g_status"),
             F.count("*").alias("n"),
             F.round(F.sum(F.col("l_quantity").cast("double")), 2).alias("sum_qty"))
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n", "sum_qty")
    )


@query(
    "agg_cube",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           ROUND(SUM(CAST(o_totalprice AS DOUBLE)), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over two dimensions",
)
def agg_cube(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"),
             F.round(F.sum(F.col("o_totalprice").cast("double")), 2).alias("total"))
    )


@query(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="explicit GROUPING SETS",
)
def agg_grouping_sets(spark, sf_dir):
    T(spark, sf_dir, "lineitem").createOrReplaceTempView("_gs_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@query(
    "agg_collect_sorted",
    """
    SELECT o_orderpriority,
           STRING_AGG(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS keys_csv
    FROM orders
    WHERE o_totalprice > 400000
    GROUP BY o_orderpriority
    """,
    doc="collect_list + sort_array + array_join (deterministic CSV rendering "
        "of a grouped collection)",
)
def agg_collect_sorted(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice") > 400000)
        .groupBy("o_orderpriority")
        .agg(F.array_join(
            F.transform(F.array_sort(F.collect_list("o_orderkey")),
                        lambda x: x.cast("string")), ",").alias("keys_csv"))
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------
@query(
    "win_topk_per_group",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM ranked WHERE rn <= 3
    """,
    doc="per-group top-k via row_number (tie-broken), the scalable top-k idiom",
)
def win_topk_per_group(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey",
                 F.col("o_totalprice").cast("double").alias("o_totalprice"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_rank_dense",
    """
    SELECT p_brand, p_partkey, p_size,
           RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS size_rank,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS size_dense_rank
    FROM part
    """,
    doc="rank vs dense_rank with real ties",
)
def win_rank_dense(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_size"))
    return p.select(
        "p_brand", "p_partkey", "p_size",
        F.rank().over(w).cast("long").alias("size_rank"),
        F.dense_rank().over(w).cast("long").alias("size_dense_rank"),
    )


@query(
    "win_lag_lead",
    """
    SELECT user_id, event_id,
           ROUND(CAST(value AS DOUBLE) -
                 LAG(CAST(value AS DOUBLE)) OVER w, 2) AS delta_prev,
           LEAD(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lag/lead over an event-time ordering",
)
def win_lag_lead(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.col("value").cast("double")
    return e.select(
        "user_id", "event_id",
        F.round(v - F.lag(v).over(w), 2).alias("delta_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "win_running_frames",
    """
    WITH c AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           CAST(SUM(cents) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / 100.0 AS running_spend,
           CAST(SUM(cents) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / CAST(COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / 100.0 AS moving_avg_3
    FROM c
    """,
    doc="running aggregate + bounded moving frame (ROWS BETWEEN). "
        "Prices are fixed to integer cents first (floor(x*100+0.5): "
        "round-half-up, IEEE-identical in both engines) so the window sums "
        "are exact integers; the final double divisions are bit-identical "
        "cross-engine, no ROUND tie-break dependence.",
)
def win_running_frames(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    o = o.withColumn("cents", cents)
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = base.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey", "o_orderkey",
        (F.sum("cents").over(run).cast("double") / 100.0)
        .alias("running_spend"),
        (F.sum("cents").over(mov).cast("double")
         / F.count(F.lit(1)).over(mov).cast("double") / 100.0)
        .alias("moving_avg_3"),
    )


@query(
    "win_range_frame",
    """
    SELECT o_orderstatus, o_orderkey,
           COUNT(*) OVER (
             PARTITION BY o_orderstatus ORDER BY CAST(o_totalprice AS DOUBLE)
             RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS n_similar_cheaper
    FROM orders
    """,
    doc="RANGE frame over a numeric ordering (value-based window)",
)
def win_range_frame(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    # float RANGE bounds need the SQL frame syntax (pyspark rangeBetween
    # only takes ints/unbounded markers)
    return o.select(
        "o_orderstatus", "o_orderkey",
        F.expr(
            "COUNT(*) OVER (PARTITION BY o_orderstatus "
            "ORDER BY CAST(o_totalprice AS DOUBLE) "
            "RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW)"
        ).alias("n_similar_cheaper"))


@query(
    "win_zscore",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND((CAST(l_extendedprice AS DOUBLE) -
                  AVG(CAST(l_extendedprice AS DOUBLE)) OVER w) /
                 STDDEV_POP(CAST(l_extendedprice AS DOUBLE)) OVER w, 4) AS price_z
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag)
    """,
    doc="per-partition z-score (the reference tutorial's normalization stage "
        "as a window aggregate)",
)
def win_zscore(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag")
    p = F.col("l_extendedprice").cast("double")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round((p - F.avg(p).over(w)) / F.stddev_pop(p).over(w), 4)
        .alias("price_z"),
    )


# --------------------------------------------------------------------------
# Sort / limit / set ops
# --------------------------------------------------------------------------
@query(
    "sort_nulls_limit",
    """
    SELECT c_custkey, c_name, bal
    FROM (SELECT c_custkey, c_name,
                 CASE WHEN c_acctbal < 0 THEN NULL
                      ELSE CAST(c_acctbal AS DOUBLE) END AS bal
          FROM customer) t
    ORDER BY bal ASC NULLS FIRST, c_custkey ASC
    LIMIT 25
    """,
    doc="global sort with explicit NULLS FIRST + deterministic LIMIT",
)
def sort_nulls_limit(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name",
                 F.when(F.col("c_acctbal") < 0, None)
                 .otherwise(F.col("c_acctbal").cast("double")).alias("bal"))
        .orderBy(F.col("bal").asc_nulls_first(), F.col("c_custkey").asc())
        .limit(25)
    )


@query(
    "set_union_all",
    """
    SELECT k FROM (
      SELECT c_nationkey AS k FROM customer
      UNION ALL
      SELECT s_nationkey AS k FROM supplier
    ) t
    """,
    doc="UNION ALL (bag semantics)",
)
def set_union_all(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.unionAll(s)


@query(
    "set_union_distinct",
    """
    SELECT c_nationkey AS k FROM customer
    UNION
    SELECT s_nationkey AS k FROM supplier
    """,
    doc="UNION (set semantics)",
)
def set_union_distinct(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    """
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey AS k FROM supplier
    """,
    doc="INTERSECT (distinct)",
)
def set_intersect(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s)


@query(
    "set_intersect_all",
    """
    SELECT l_partkey % 50 AS k FROM lineitem WHERE l_quantity > 45
    INTERSECT ALL
    SELECT p_partkey % 50 AS k FROM part WHERE p_size > 25
    """,
    doc="INTERSECT ALL (bag semantics): each value keeps "
        "min(multiplicity_left, multiplicity_right) copies — the "
        "multiset operator DISTINCT intersect loses. Spark plans it as "
        "a counted anti-semantics join under the hood; both operands "
        "are filtered fact projections, so the duplicate counts are "
        "real on both sides",
)
def set_intersect_all(spark, sf_dir):
    a = (T(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
         .select((F.col("l_partkey") % 50).alias("k")))
    b = (T(spark, sf_dir, "part").filter(F.col("p_size") > 25)
         .select((F.col("p_partkey") % 50).alias("k")))
    return a.intersectAll(b)


@query(
    "set_except_all",
    """
    SELECT l_partkey % 50 AS k FROM lineitem WHERE l_quantity > 45
    EXCEPT ALL
    SELECT p_partkey % 50 AS k FROM part WHERE p_size > 25
    """,
    doc="EXCEPT ALL (bag semantics): each value keeps "
        "max(0, multiplicity_left - multiplicity_right) copies — the "
        "per-occurrence difference DISTINCT except collapses. Same "
        "operands as set_intersect_all, so together the two faces "
        "partition the left multiset exactly",
)
def set_except_all(spark, sf_dir):
    a = (T(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
         .select((F.col("l_partkey") % 50).alias("k")))
    b = (T(spark, sf_dir, "part").filter(F.col("p_size") > 25)
         .select((F.col("p_partkey") % 50).alias("k")))
    return a.exceptAll(b)


@query(
    "set_except",
    """
    SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
    EXCEPT
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="EXCEPT (distinct): negative-balance customers minus those with "
        "a finished order. (The nationkey variant was a subset relation "
        "in the fixture — empty output, a vacuous 0==0 hash check; this "
        "operand pair leaves a real difference at every SF)",
)
def set_except(spark, sf_dir):
    c = (T(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
         .select(F.col("c_custkey").alias("k")))
    o = (T(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F")
         .select(F.col("o_custkey").alias("k")))
    return c.subtract(o)  # EXCEPT DISTINCT (exceptAll would be bag-except)


# --------------------------------------------------------------------------
# Scalar functions: string / date / math / array / map+JSON
# --------------------------------------------------------------------------
@query(
    "fn_string",
    """
    SELECT p_partkey,
           UPPER(p_brand) AS brand_u,
           LOWER(p_type) AS type_l,
           TRIM(CONCAT(p_name, ' ')) AS name_t,
           SUBSTRING(p_name, 1, 5) AS name5,
           LENGTH(p_name) AS name_len,
           REGEXP_EXTRACT(p_type, '([A-Z]+)', 1) AS type_word,
           CAST(LEN(STRING_SPLIT(p_name, ' ')) AS INT) AS n_words
    FROM part
    """,
    doc="string functions: concat/substring/lower/upper/trim/split/regexp_extract",
)
def fn_string(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.trim(F.concat(F.col("p_name"), F.lit(" "))).alias("name_t"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.length("p_name").alias("name_len").cast("long"),
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("type_word"),
        F.size(F.split("p_name", " ")).alias("n_words"),
    )


@query(
    "fn_date",
    """
    SELECT o_orderkey,
           STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS order_month,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(dow FROM o_orderdate) AS INT) AS order_dow,
           CAST(EPOCH(o_orderdate) AS BIGINT) AS order_epoch,
           DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95
    FROM orders
    """,
    doc="date functions: date_trunc, extract, unix epoch, datediff",
)
def fn_date(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
        .alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit("1995-01-01").cast("date")).alias("days_since_95"),
    )


@query(
    "fn_bitwise_conditional",
    """
    SELECT l_returnflag,
           BIT_AND(CAST(l_linenumber AS BIGINT)) AS all_bits,
           BIT_OR(CAST(l_linenumber AS BIGINT)) AS any_bits,
           BIT_XOR(CAST(l_orderkey AS BIGINT)) AS xor_keys,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
           BOOL_AND(l_quantity > 0) AS all_positive,
           BOOL_OR(l_discount > 0.09) AS any_high_disc,
           CAST(SUM(CAST(l_orderkey AS BIGINT) & 255) AS BIGINT) AS sum_low_byte,
           CAST(SUM(CAST(l_orderkey AS BIGINT) >> 4) AS BIGINT) AS sum_shifted
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="bitwise aggregates (bit_and/or/xor), conditional aggregation "
        "(count_if / FILTER), boolean aggregates (every/any), and bitwise "
        "scalar ops (& >>) — all JVM built-ins, partial-agg friendly",
)
def fn_bitwise_conditional(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey").cast("bigint")
    return li.groupBy("l_returnflag").agg(
        F.bit_and(F.col("l_linenumber").cast("bigint")).alias("all_bits"),
        F.bit_or(F.col("l_linenumber").cast("bigint")).alias("any_bits"),
        F.bit_xor(key).alias("xor_keys"),
        F.count_if(F.col("l_quantity") > 25).alias("n_big"),
        F.every(F.col("l_quantity") > 0).alias("all_positive"),
        F.some(F.col("l_discount") > 0.09).alias("any_high_disc"),
        F.sum(key.bitwiseAND(F.lit(255))).cast("bigint").alias("sum_low_byte"),
        F.sum(F.expr("CAST(l_orderkey AS BIGINT) >> 4")).cast("bigint")
        .alias("sum_shifted"),
    )


@query(
    "fn_math",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(LOG10(CAST(l_extendedprice AS DOUBLE)), 6) AS log_price,
           ROUND(SQRT(CAST(l_quantity AS DOUBLE)), 6) AS sqrt_qty,
           ROUND(POW(CAST(l_discount AS DOUBLE), 2), 6) AS disc_sq,
           ABS(ROUND(CAST(l_quantity AS DOUBLE) - 25.0, 1)) AS dist25,
           ROUND(CAST(l_tax AS DOUBLE), 1) AS tax_r1,
           ROUND(ATAN2(CAST(l_quantity AS DOUBLE), CAST(l_tax AS DOUBLE) + 1.0), 6) AS angle,
           ROUND(SQRT(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE) +
                      CAST(l_tax AS DOUBLE) * CAST(l_tax AS DOUBLE)), 6) AS hyp
    FROM lineitem
    WHERE l_orderkey % 7 = 0
    """,
    doc="math functions: log10/sqrt/pow/abs/round/atan2/hypot",
)
def fn_math(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 7 == 0)
    q = F.col("l_quantity").cast("double")
    tax = F.col("l_tax").cast("double")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.log10(F.col("l_extendedprice").cast("double")), 6).alias("log_price"),
        F.round(F.sqrt(q), 6).alias("sqrt_qty"),
        F.round(F.pow(F.col("l_discount").cast("double"), 2), 6).alias("disc_sq"),
        F.abs(F.round(q - 25.0, 1)).alias("dist25"),
        F.round(tax, 1).alias("tax_r1"),
        F.round(F.atan2(q, tax + 1.0), 6).alias("angle"),
        F.round(F.hypot(q, tax), 6).alias("hyp"),
    )


@query(
    "fn_array",
    """
    SELECT doc_id,
           words[1] AS first_word,
           CAST(LEN(words) AS INT) AS n_words,
           CAST(LEN(LIST_DISTINCT(words)) AS INT) AS n_unique,
           ARRAY_TO_STRING(LIST_SORT(words[1:5]), '|') AS first5_sorted,  -- [1:5] inclusive = 5 elems
           CAST(LIST_SUM(LIST_TRANSFORM(words, w -> LENGTH(w))) AS BIGINT) AS total_chars,
           ARRAY_TO_STRING(LIST_TRANSFORM(RANGE(1, 4), i -> CAST(i * doc_id AS VARCHAR)), ',') AS seq_csv
    FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS words FROM documents) t
    """,
    doc="array functions: split/element_at/size/array_distinct/sort_array/"
        "slice/transform/aggregate/sequence/array_join",
)
def fn_array(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    words = F.split("text", " ")
    t = d.select("doc_id", words.alias("words"))
    return t.select(
        "doc_id",
        F.element_at("words", 1).alias("first_word"),
        F.size("words").alias("n_words"),
        F.size(F.array_distinct("words")).alias("n_unique"),
        F.array_join(F.sort_array(F.slice("words", 1, 5)), "|").alias("first5_sorted"),
        F.aggregate(F.transform("words", F.length),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("total_chars"),
        F.array_join(F.transform(F.sequence(F.lit(1), F.lit(3)),
                                 lambda i: (i * F.col("doc_id")).cast("string")),
                     ",").alias("seq_csv"),
    )


@query(
    "fn_json_map",
    """
    SELECT event_id,
           CAST(props->>'$.k' AS VARCHAR) AS k_str,
           CAST(JSON_EXTRACT(props, '$.k') AS INT) AS k_int,
           'k' AS first_key
    FROM events
    """,
    doc="JSON extraction (get_json_object / from_json) + map access "
        "(map_keys / element_at)",
)
def fn_json_map(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.element_at(m, "k").alias("k_int"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
    )


@query(
    "join_salted_skew",
    """
    SELECT o.o_orderpriority,
           ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DOUBLE)), 2)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="salted skew join: the big side gets a deterministic salt in "
        "[0,4), the dimension side is replicated once per salt (explode), "
        "and the join runs on (key, salt) — splitting any hot key across 4 "
        "reducers. Salting is semantically transparent, so the oracle is "
        "the PLAIN join: identical results prove the rewrite safe. This is "
        "the manual form of what AQE skew-join does adaptively "
        "(spark.sql.adaptive.skewJoin, on in session.py); the manual form "
        "still matters at 100 TB when skew is known ahead of time "
        "(AQE only splits after a stage materializes its skewed output)",
)
def join_salted_skew(spark, sf_dir):
    n_salt = 4
    li = (T(spark, sf_dir, "lineitem")
          .withColumn("_salt", F.pmod("l_linenumber", F.lit(n_salt))))
    o = (T(spark, sf_dir, "orders")
         .withColumn("_salt", F.explode(F.sequence(F.lit(0),
                                                   F.lit(n_salt - 1)))))
    return (
        li.join(o.hint("merge"),
                (li.l_orderkey == o.o_orderkey) & (li._salt == o._salt))
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum((F.col("l_extendedprice")
                            * (1 - F.col("l_discount"))).cast("double")), 2)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )


@query(
    "star_local_revenue",
    """
    SELECT n_name,
           ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DOUBLE)), 2)
               AS revenue,
           COUNT(*) AS n_lines
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 6-table star — fact-fact customer⋈orders⋈lineitem "
        "with the local-supplier correlation (c_nationkey = s_nationkey) "
        "and the nation→region dim chain. Declared as plain joins: "
        "Catalyst pushes the date and region predicates to the scans, "
        "prunes columns, and AQE picks broadcast for every dim side, so "
        "only the fact-fact hash joins shuffle. The canonical 'let the "
        "optimizer do join planning' entry — no hints needed",
)
def star_local_revenue(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01"))
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (c.join(o, F.col("c_custkey") == F.col("o_custkey"))
            .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(s, (F.col("l_suppkey") == F.col("s_suppkey"))
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
            .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
            .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
            .groupBy("n_name")
            .agg(F.round(F.sum((F.col("l_extendedprice")
                                * (1 - F.col("l_discount"))).cast("double")),
                         2).alias("revenue"),
                 F.count("*").alias("n_lines")))


@query(
    "basket_lift_pairs",
    """
    WITH items AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_type AS t
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM items),
    marg AS (SELECT t, COUNT(*) AS c FROM items GROUP BY t),
    pairs AS (
        SELECT a.t AS type_a, b.t AS type_b, COUNT(*) AS together
        FROM items a JOIN items b ON a.okey = b.okey AND a.t < b.t
        GROUP BY a.t, b.t
    )
    SELECT p.type_a, p.type_b, p.together,
           ROUND((CAST(p.together AS DOUBLE) / n.n_orders)
                 / ((CAST(ma.c AS DOUBLE) / n.n_orders)
                    * (CAST(mb.c AS DOUBLE) / n.n_orders)), 4) AS lift
    FROM pairs p
    JOIN marg ma ON p.type_a = ma.t
    JOIN marg mb ON p.type_b = mb.t
    CROSS JOIN n
    """,
    doc="market-basket association: for part-type pairs co-occurring in an "
        "order, lift = P(a,b)/(P(a)P(b)). The per-order self-join fans "
        "out only items-per-basket-squared rows (baskets are small and "
        "types deduped per order first, so the join is bounded — never "
        "catalog x catalog); marginals and the basket count are "
        "type-cardinality aggregates broadcast into the final projection. "
        "The association-rules primitive recommendation pipelines start "
        "from",
)
def basket_lift_pairs(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    items = (li.join(dim_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
             .select(F.col("l_orderkey").alias("okey"),
                     F.col("p_type").alias("t"))
             .distinct())
    # basket count folded into the SAME plan as a broadcast scalar (like
    # rfm_segments/pareto_abc) — no separate driver-side job re-reading the
    # distinct set
    n = items.agg(F.count_distinct("okey").alias("n_orders"))
    marg = items.groupBy("t").agg(F.count("*").alias("c"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (a.join(b, (F.col("a.okey") == F.col("b.okey"))
                    & (F.col("a.t") < F.col("b.t")))
             .groupBy(F.col("a.t").alias("type_a"),
                      F.col("b.t").alias("type_b"))
             .agg(F.count("*").alias("together")))
    ma = marg.select(F.col("t").alias("type_a"), F.col("c").alias("ca"))
    mb = marg.select(F.col("t").alias("type_b"), F.col("c").alias("cb"))
    n_orders = F.col("n_orders").cast("double")
    lift = ((F.col("together").cast("double") / n_orders)
            / ((F.col("ca").cast("double") / n_orders)
               * (F.col("cb").cast("double") / n_orders)))
    return (pairs.join(F.broadcast(ma), "type_a")
            .join(F.broadcast(mb), "type_b")
            .crossJoin(F.broadcast(n))
            .select("type_a", "type_b", "together",
                    F.round(lift, 4).alias("lift")))


@query(
    "rfm_segments",
    """
    WITH per_cust AS (
        SELECT o_custkey,
               MAX(CAST(o_orderdate AS DATE)) AS last_d,
               COUNT(*) AS freq,
               SUM(CAST(o_totalprice AS DOUBLE)) AS monetary
        FROM orders GROUP BY o_custkey
    ),
    anchored AS (
        SELECT *, (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders) AS now_d
        FROM per_cust
    ),
    rfm AS (
        SELECT o_custkey, CAST(now_d - last_d AS DOUBLE) AS recency_days,
               CAST(freq AS DOUBLE) AS freq, monetary
        FROM anchored
    ),
    th AS (
        SELECT QUANTILE_CONT(recency_days, 0.5) AS r_med,
               QUANTILE_CONT(freq, 0.5) AS f_med,
               QUANTILE_CONT(monetary, 0.5) AS m_med
        FROM rfm
    )
    SELECT o_custkey,
           CASE WHEN recency_days <= th.r_med THEN 2 ELSE 1 END AS r_score,
           CASE WHEN freq > th.f_med THEN 2 ELSE 1 END AS f_score,
           CASE WHEN monetary > th.m_med THEN 2 ELSE 1 END AS m_score
    FROM rfm CROSS JOIN th
    """,
    doc="RFM segmentation: per-customer recency (vs the data's max order "
        "date — deterministic anchor), frequency, monetary from ONE "
        "grouped pass; scores assigned against exact median thresholds "
        "computed once and broadcast — never a global ntile window (the "
        "unpartitioned-sort anti-pattern at scale). The CRM segmentation "
        "staple in threshold form",
)
def rfm_segments(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    per_cust = (o.groupBy("o_custkey")
                .agg(F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
                     F.count("*").cast("double").alias("freq"),
                     F.sum(F.col("o_totalprice").cast("double"))
                      .alias("monetary")))
    now_d = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("now_d"))
    rfm = (per_cust.crossJoin(F.broadcast(now_d))
           .select("o_custkey",
                   F.datediff("now_d", "last_d").cast("double")
                    .alias("recency_days"),
                   "freq", "monetary"))
    th = rfm.agg(F.percentile("recency_days", F.lit(0.5)).alias("r_med"),
                 F.percentile("freq", F.lit(0.5)).alias("f_med"),
                 F.percentile("monetary", F.lit(0.5)).alias("m_med"))
    return (rfm.crossJoin(F.broadcast(th))
            .select("o_custkey",
                    F.when(F.col("recency_days") <= F.col("r_med"), 2)
                     .otherwise(1).alias("r_score"),
                    F.when(F.col("freq") > F.col("f_med"), 2)
                     .otherwise(1).alias("f_score"),
                    F.when(F.col("monetary") > F.col("m_med"), 2)
                     .otherwise(1).alias("m_score")))


@query(
    "pareto_abc_customers",
    """
    WITH rev AS (
        SELECT o_custkey, SUM(CAST(o_totalprice AS DOUBLE)) AS r
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT o_custkey, r,
               SUM(r) OVER (ORDER BY r DESC, o_custkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(r) OVER () AS tot
        FROM rev
    )
    SELECT o_custkey,
           CASE WHEN cum / tot <= 0.5 THEN 'A'
                WHEN cum / tot <= 0.8 THEN 'B' ELSE 'C' END AS abc
    FROM ranked
    """,
    doc="Pareto / ABC classification: customers ranked by revenue, "
        "classified by cumulative revenue share (A: first 50%, B: to "
        "80%, C: tail). The running-share window is global-ordered BUT "
        "runs on the per-customer AGGREGATE — already reduced orders of "
        "magnitude below the fact table — so the single-ordered-partition "
        "cost is bounded by customer count, not order volume (for "
        "billion-customer tables, swap in the global_index bucket trick "
        "from dataprep)",
)
def pareto_abc_customers(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    rev = (o.groupBy("o_custkey")
           .agg(F.sum(F.col("o_totalprice").cast("double")).alias("r")))
    w = (Window.orderBy(F.desc("r"), F.asc("o_custkey"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy()
    share = F.sum("r").over(w) / F.sum("r").over(wt)
    return rev.select(
        "o_custkey",
        F.when(share <= 0.5, "A").when(share <= 0.8, "B")
         .otherwise("C").alias("abc"))


@query(
    "star_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           STRFTIME(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape (large-volume customers): a HAVING-filtered "
        "self-aggregate of the fact table semi-joins back into a "
        "customer/orders/lineitem star. The big-order key set is tiny "
        "after the HAVING (a fraction of a percent of orders), so the "
        "semi-join broadcasts; both lineitem passes aggregate partially "
        "map-side; the top-100 is TakeOrderedAndProject. Scale shape: "
        "2 fact scans (Spark can't reuse the scan across the subquery), "
        "shuffles keyed on l_orderkey, never on the customer row",
)
def star_large_orders(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    big = (l.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("q"))
           .filter(F.col("q") > 250)
           .select("l_orderkey"))
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return (l.join(F.broadcast(big), "l_orderkey")
            .join(o, l.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                     "o_totalprice")
            .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
            .select("c_name", "c_custkey", "o_orderkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                     .alias("o_orderdate"),
                    F.round("o_totalprice", 2).alias("o_totalprice"),
                    "total_qty")
            .orderBy(F.desc("o_totalprice"), "o_orderkey").limit(100))


@query(
    "agg_approx_percentiles",
    """
    SELECT event_type, 1 AS q50_ok, 1 AS q95_ok, 1 AS q99_ok
    FROM events
    GROUP BY event_type
    """,
    doc="approx_percentile (quantile sketch) per event_type — the "
        "mergeable, bounded-memory alternative to exact percentile_cont "
        "at 100 TB (exact quantiles need a full sort per group; the "
        "sketch folds map-side like any partial agg). The sketch value "
        "itself isn't replayable in DuckDB, so — like "
        "agg_approx_count_distinct — the oracled contract is the "
        "tolerance: per group and per quantile q, the approx value must "
        "land inside the EXACT [q-0.005, q+0.005] quantile bracket "
        "(accuracy=10000 bounds rank error at 1e-4, so the bracket is a "
        "50x margin). The Spark side computes both the sketch and the "
        "exact brackets and emits the booleans; the oracle asserts TRUE "
        "per group. Accuracy is additionally asserted in "
        "tests/test_relational.py::test_approx_percentiles_within_accuracy.",
)
def agg_approx_percentiles(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    q = (e.groupBy("event_type")
         .agg(F.percentile_approx(
                  v, F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)),
                  10000).alias("approx_q"),
              F.percentile(
                  v, F.array(F.lit(0.495), F.lit(0.945), F.lit(0.985)))
               .alias("lo_q"),
              F.percentile(
                  v, F.array(F.lit(0.505), F.lit(0.955), F.lit(0.995)))
               .alias("hi_q")))

    def ok(i, name):
        return ((F.col("approx_q")[i] >= F.col("lo_q")[i])
                & (F.col("approx_q")[i] <= F.col("hi_q")[i])
                ).cast("int").alias(name)

    return q.select("event_type", ok(0, "q50_ok"), ok(1, "q95_ok"),
                    ok(2, "q99_ok"))


@query(
    "star_topk_unshipped",
    """
    SELECT l.l_orderkey AS orderkey,
           STRFTIME(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1995-03-15'
      AND CAST(l.l_shipdate AS DATE) > DATE '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (top unshipped orders by potential revenue): "
        "segment-filtered customer dim BROADCAST into orders, the "
        "date-filtered fact join carries only pruned columns, and the "
        "top-10 lands via TakeOrderedAndProject — per-partition heaps "
        "merged on the driver, never a global sort of the aggregate. "
        "Both date predicates push into the parquet scans. Revenue is "
        "rounded before ordering with orderkey as the total tiebreak so "
        "both engines cut the same top-10",
)
def star_topk_unshipped(spark, sf_dir):
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = (T(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate").cast("date") < F.lit("1995-03-15"))
         .select("o_orderkey", "o_custkey", "o_orderdate"))
    li = (T(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate").cast("date") > F.lit("1995-03-15"))
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    return (o.join(dim_broadcast(c.select("c_custkey"), sf_dir, "customer"),
                   o.o_custkey == F.col("c_custkey"))
            .join(li, o.o_orderkey == li.l_orderkey)
            .groupBy(F.col("l_orderkey").alias("orderkey"),
                     F.date_format("o_orderdate", "yyyy-MM-dd")
                      .alias("orderdate"))
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("orderkey"))
            .limit(10))


# --------------------------------------------------------------------------
# TPC-H Q8 / Q17 / Q21 shapes (reference BASELINE.json north-star queries;
# adapted to the testdata's columns — no p_container/l_receiptdate here)
# --------------------------------------------------------------------------
@query(
    "star_market_share",
    """
    WITH sales AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part      ON p_partkey = l_partkey
      JOIN supplier  ON s_suppkey = l_suppkey
      JOIN orders    ON o_orderkey = l_orderkey
      JOIN customer  ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region    ON r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
    )
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE 0 END) / SUM(volume), 4) AS mkt_share,
           COUNT(*) AS n_lines
    FROM sales GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: national market share — NATION_3's slice of "
        "PROMO-part revenue sold into AMERICA, per order year. An 8-table "
        "snowflake where ONLY the customer side is region-filtered and "
        "the supplier side keeps every nation (the classic both-roles "
        "nation join, aliased twice). Declared as plain joins: part, "
        "supplier, both nations and region broadcast at any scale, so "
        "the only shuffles are the lineitem⋈orders⋈customer fact chain; "
        "the share is a conditional-sum ratio inside one partial "
        "aggregate (no per-nation second pass). Cites reference "
        "BASELINE.json join-query family",
)
def star_market_share(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    p = (T(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
         .select("p_partkey"))
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                          "o_orderdate")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = T(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nkey"),
        F.col("n_name").alias("supp_nation"))
    r = (T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
         .select("r_regionkey"))
    sales = (li.join(dim_broadcast(p, sf_dir, "part"), F.col("p_partkey") == F.col("l_partkey"))
             .join(dim_broadcast(s, sf_dir, "supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
             .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
             .join(c, F.col("c_custkey") == F.col("o_custkey"))
             .join(F.broadcast(n1),
                   F.col("n_nationkey") == F.col("c_nationkey"))
             .join(F.broadcast(r),
                   F.col("r_regionkey") == F.col("n_regionkey"))
             .join(F.broadcast(n2),
                   F.col("supp_nkey") == F.col("s_nationkey"))
             .select(F.year("o_orderdate").alias("o_year"),
                     (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                     .cast("double").alias("volume"),
                     "supp_nation"))
    share = (F.sum(F.when(F.col("supp_nation") == "NATION_3",
                          F.col("volume")).otherwise(0.0))
             / F.sum("volume"))
    return (sales.groupBy("o_year")
            .agg(F.round(share, 4).alias("mkt_share"),
                 F.count("*").alias("n_lines")))


@query(
    "sub_small_qty_revenue",
    """
    SELECT p_brand,
           ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part ON p_partkey = l.l_partkey
    WHERE p_brand IN ('Brand#12', 'Brand#23')
      AND l.l_quantity < 0.2 * (
            SELECT AVG(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey)
    GROUP BY p_brand
    """,
    doc="TPC-H Q17 shape: small-quantity-order revenue — lines whose "
        "quantity is under 20% of that part's own average, for two "
        "brands. The correlated scalar AVG is the textbook "
        "decorrelation case: the brand filter broadcasts into the "
        "lineitem scan first, and because every line of a surviving "
        "part survives the join, a part-keyed window AVG over the "
        "joined rows equals the per-part average over the full table — "
        "so the whole query is one broadcast join + ONE part-keyed "
        "shuffle, never a second full lineitem scan for the inner "
        "aggregate. Per-part averages are sums of small integer sets "
        "(exact in doubles), so the threshold compare is "
        "engine-order-proof",
)
def sub_small_qty_revenue(spark, sf_dir):
    p = (T(spark, sf_dir, "part")
         .filter(F.col("p_brand").isin("Brand#12", "Brand#23"))
         .select("p_partkey", "p_brand"))
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity",
                                             "l_extendedprice")
    w = Window.partitionBy("l_partkey")
    return (li.join(dim_broadcast(p, sf_dir, "part"), F.col("p_partkey") == F.col("l_partkey"))
            .withColumn("avg_qty", F.avg("l_quantity").over(w))
            .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
            .groupBy("p_brand")
            .agg(F.round(F.sum("l_extendedprice") / 7.0, 2)
                 .alias("avg_yearly"),
                 F.count("*").alias("n_lines")))


@query(
    "sub_late_sole_supplier",
    """
    WITH waits AS (
      SELECT DISTINCT l1.l_suppkey, l1.l_orderkey
      FROM lineitem l1
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate >
                              o.o_orderdate + INTERVAL 90 DAY)
    )
    SELECT s_suppkey, s_name, COUNT(*) AS numwait
    FROM waits JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_suppkey, s_name
    """,
    doc="TPC-H Q21 shape: suppliers who were the SOLE late shipper "
        "(>90 days after order date) on a finished multi-supplier "
        "order. The oracle is the canonical triple-self-join "
        "EXISTS/NOT-EXISTS form; the Spark program is the scale "
        "rewrite — ONE order-keyed aggregate collects each order's "
        "supplier set and late-supplier set (both bounded by "
        "suppliers-per-order, single-digit state), then "
        "size(late)=1 AND size(all)>1 picks the culprit row-locally. "
        "That replaces three lineitem shuffles (l1⋈l2⋈l3, the plan "
        "DuckDB decorrelates to) with one shuffle plus a broadcast "
        "supplier-name join — at 100 TB the difference between "
        "re-shuffling the biggest fact table three times and once. "
        "Identical results prove the rewrite",
)
def sub_late_sole_supplier(spark, sf_dir):
    o = (T(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey",
                                             "l_shipdate")
    late = (F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    per_order = (li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
                 .groupBy("l_orderkey")
                 .agg(F.collect_set("l_suppkey").alias("supps"),
                      F.collect_set(F.when(late, F.col("l_suppkey")))
                       .alias("late_supps")))
    sole = (per_order
            .filter((F.size("late_supps") == 1) & (F.size("supps") > 1))
            .select(F.element_at("late_supps", 1).alias("culprit")))
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (sole.groupBy("culprit").agg(F.count("*").alias("numwait"))
            .join(dim_broadcast(s, sf_dir, "supplier"), F.col("s_suppkey") == F.col("culprit"))
            .select("s_suppkey", "s_name", "numwait"))


# --------------------------------------------------------------------------
# TPC-H Q4 / Q7 / Q12 / Q13 / Q14 / Q15 / Q19 / Q22 shapes (round 7;
# adapted to the testdata's columns — no l_commitdate/l_shipmode/c_phone/
# partsupp here, and money aggregates ride EXACT integer sub-cent sums so
# every face full-hash-matches regardless of partitioning/summation order)
# --------------------------------------------------------------------------
_NET4_SQL = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)"


def _net4():
    """price*(1-discount) in exact 1e-4 units: the two float ops are
    IEEE-identical across engines on identical parquet doubles, and the
    integer sum is order-independent — the money-face determinism idiom."""
    return F.round((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                   * 10000).cast("bigint")


@query(
    "orders_priority_exists",
    """
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape (order-priority checking): correlated EXISTS "
        "against the fact decorrelates to a LEFT SEMI join; the quarter "
        "predicate pushes into the orders scan and the returnflag "
        "predicate into the lineitem scan BEFORE the join, so the semi "
        "join's build side is the filtered fact, not the raw table. "
        "Output is integer counts — exact by construction",
)
def orders_priority_exists(spark, sf_dir):
    o = (T(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate").cast("date") >= F.lit("1996-01-01"))
                 & (F.col("o_orderdate").cast("date") < F.lit("1996-04-01"))))
    ret = (T(spark, sf_dir, "lineitem")
           .filter(F.col("l_returnflag") == "R").select("l_orderkey"))
    return (o.join(ret, o.o_orderkey == ret.l_orderkey, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders")))


@query(
    "star_nation_volume",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM CAST(l.l_shipdate AS DATE)) AS INT)
             AS l_year,
           CAST(SUM({_NET4_SQL}) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape (volume shipping between two nations): the fact "
        "joins BOTH role-playing nation dims (via supplier and via "
        "customer/orders); every dim side broadcasts, the disjunctive "
        "nation-pair predicate prunes after the cheap dim joins, and the "
        "year rollup is one partial agg. Revenue is an exact integer "
        "1e-4-unit sum — full hash match at any partitioning",
)
def star_nation_volume(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", _net4().alias("net4"))
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(F.col("n_nationkey").alias("nk1"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"),
                  F.col("n_name").alias("cust_nation"))
    pair = (((F.col("supp_nation") == "NATION_3")
             & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7")
               & (F.col("cust_nation") == "NATION_3")))
    return (li.join(dim_broadcast(s, sf_dir, "supplier"), li.l_suppkey == s.s_suppkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(dim_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year(F.col("l_shipdate").cast("date")).alias("l_year"))
            .agg((F.sum("net4").cast("double") / F.lit(10000.0))
                 .alias("revenue")))


@query(
    "line_priority_counts",
    """
    SELECT l.l_returnflag AS flag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q12 shape (shipping-mode priority audit; l_returnflag "
        "stands in for the absent l_shipmode): conditional counts fold "
        "in ONE partial agg on the join output — no per-priority "
        "re-scans; the ship-year predicate pushes into the fact scan. "
        "Integer counts — exact",
)
def line_priority_counts(spark, sf_dir):
    li = (T(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
                  & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01")))
          .select("l_orderkey", "l_returnflag"))
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy(F.col("l_returnflag").alias("flag"))
            .agg(F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count")))


@query(
    "cust_order_count_dist",
    """
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'F'
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    doc="TPC-H Q13 shape (customer order-count distribution): LEFT OUTER "
        "join keeps zero-order customers (COUNT of the nullable side "
        "counts only matches), then a count-of-counts second aggregate — "
        "the distribution-histogram double-agg. The residual status "
        "predicate rides the join, not a post-filter (it must not drop "
        "the NULL rows). Integer counts — exact",
)
def cust_order_count_dist(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select("c_custkey")
    o = (T(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") != "F")
         .select("o_custkey", "o_orderkey"))
    per_c = (c.join(o, c.c_custkey == o.o_custkey, "left")
             .groupBy("c_custkey")
             .agg(F.count("o_orderkey").alias("c_count")))
    return (per_c.groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


@query(
    "promo_revenue_share",
    f"""
    SELECT ROUND(CAST(SUM(CASE WHEN p.p_type = 'ECONOMY'
                              THEN {_NET4_SQL} ELSE 0 END) AS DOUBLE)
                 * 100.0
                 / CAST(SUM({_NET4_SQL}) AS DOUBLE), 4) AS promo_share
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-09-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1996-10-01'
    """,
    doc="TPC-H Q14 shape (promo revenue share; p_type='ECONOMY' stands in "
        "for PROMO%): conditional and total sums fold in the SAME "
        "partial agg over one broadcast part join — never two scans. "
        "Both sums are exact integer 1e-4 units, so the share divides "
        "two identical bigints on both engines — bit-exact before ROUND",
)
def promo_revenue_share(spark, sf_dir):
    li = (T(spark, sf_dir, "lineitem")
          .filter((F.col("l_shipdate").cast("date") >= F.lit("1996-09-01"))
                  & (F.col("l_shipdate").cast("date") < F.lit("1996-10-01")))
          .select("l_partkey", _net4().alias("net4")))
    p = T(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "ECONOMY", F.col("net4")).otherwise(0)
    return (li.join(dim_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
            .agg(F.round(F.sum(promo).cast("double") * F.lit(100.0)
                         / F.sum("net4").cast("double"), 4)
                 .alias("promo_share")))


@query(
    "top_revenue_suppliers",
    f"""
    WITH rev AS (
      SELECT l_suppkey AS suppkey, SUM({_NET4_SQL}) AS total4
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total4 AS DOUBLE) / 10000.0 AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.suppkey
    WHERE r.total4 = (SELECT MAX(total4) FROM rev)
    """,
    doc="TPC-H Q15 shape (top supplier by quarterly revenue, ties kept): "
        "the revenue view aggregates once; its MAX is a one-row "
        "broadcast compared by EXACT integer equality (float revenue "
        "equality across engines is a knife edge; bigint 1e-4 units are "
        "not). Supplier dim broadcasts onto the winner set",
)
def top_revenue_suppliers(spark, sf_dir):
    rev = (T(spark, sf_dir, "lineitem")
           .filter((F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
                   & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01")))
           .groupBy(F.col("l_suppkey").alias("suppkey"))
           .agg(F.sum(_net4()).alias("total4")))
    mx = rev.agg(F.max("total4").alias("mx"))
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (rev.crossJoin(F.broadcast(mx))
            .filter(F.col("total4") == F.col("mx"))
            .join(dim_broadcast(s, sf_dir, "supplier"), F.col("s_suppkey") == F.col("suppkey"))
            .select("s_suppkey", "s_name",
                    (F.col("total4").cast("double") / F.lit(10000.0))
                    .alias("total_revenue")))


@query(
    "disjunctive_revenue",
    f"""
    SELECT CAST(SUM({_NET4_SQL}) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (disjunctive brand/size/quantity predicate): "
        "Catalyst extracts the common conjuncts from the OR-of-ANDs — "
        "l_quantity BETWEEN 1 AND 30 pushes into the lineitem scan and "
        "the brand IN-list + size range into the part scan — so the "
        "broadcast join sees pre-pruned sides and the full disjunction "
        "evaluates only on survivors. Exact integer revenue",
)
def disjunctive_revenue(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", _net4().alias("net4"))
    p = T(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    arm = lambda brand, size_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, size_hi)
        & F.col("l_quantity").between(q_lo, q_hi))
    return (li.join(dim_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
            .filter(arm("Brand#3", 5, 1, 11) | arm("Brand#12", 10, 10, 20)
                    | arm("Brand#20", 15, 20, 30))
            .agg((F.sum("net4").cast("double") / F.lit(10000.0))
                 .alias("revenue")))


@query(
    "idle_customers_balance",
    """
    WITH pos AS (
      SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS s,
             COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0.0
    ),
    sel AS (
      SELECT c.c_custkey % 7 AS cgroup,
             CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS bal2
      FROM customer c CROSS JOIN pos
      WHERE c.c_custkey % 7 IN (0, 2, 3, 5)
        AND CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * pos.n > pos.s
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND CAST(o.o_orderdate AS DATE)
                              >= DATE '1999-01-01')
    )
    SELECT CAST(cgroup AS BIGINT) AS cgroup, COUNT(*) AS numcust,
           CAST(SUM(bal2) AS DOUBLE) / 100.0 AS totacctbal
    FROM sel GROUP BY cgroup
    """,
    doc="TPC-H Q22 shape (global-sales-opportunity: above-average-balance "
        "customers idle since 1999; c_custkey%7 stands in for the "
        "phone country code): the positive-balance average is a one-row "
        "broadcast, and `bal > avg` is evaluated as the EXACT integer "
        "cross-multiplication bal_cents*n > sum_cents — no float "
        "average ever exists, so membership cannot flip at an engine "
        "boundary. NOT EXISTS decorrelates to a LEFT ANTI join on the "
        "orders key projection",
)
def idle_customers_balance(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select(
        "c_custkey", F.round(F.col("c_acctbal") * 100).cast("bigint")
        .alias("bal2"))
    pos = (c.filter(F.col("bal2") > 0)
           .agg(F.sum("bal2").alias("s"), F.count("*").alias("n")))
    o = (T(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate").cast("date") >= F.lit("1999-01-01"))
         .select("o_custkey"))
    return (c.filter((F.col("c_custkey") % 7).isin(0, 2, 3, 5))
            .crossJoin(F.broadcast(pos))
            .filter(F.col("bal2") * F.col("n") > F.col("s"))
            .join(o, c.c_custkey == o.o_custkey, "left_anti")
            .groupBy((F.col("c_custkey") % 7).alias("cgroup"))
            .agg(F.count("*").alias("numcust"),
                 (F.sum("bal2").cast("double") / F.lit(100.0))
                 .alias("totacctbal")))


# --------------------------------------------------------------------------
# TPC-H Q2 / Q6 / Q9 / Q10 / Q11 / Q16 / Q20 shapes (round 7, second batch —
# completes all 22 TPC-H query shapes). partsupp does not exist in the
# testdata, so the supply relationship is derived from lineitem (the set of
# (l_partkey, l_suppkey) pairs IS the supplier-part catalog, and observed
# unit price l_extendedprice / l_quantity stands in for ps_supplycost).
# Money faces ride exact integer sub-cent sums; MIN/MAX/COUNT faces are
# order-independent by construction — every face full-hash-matches under
# any partitioning.
# --------------------------------------------------------------------------


@query(
    "min_cost_supplier",
    """
    WITH cost AS (
      SELECT l.l_partkey, l.l_suppkey,
             MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY 1, 2
    ),
    best AS (SELECT l_partkey, MIN(unit_cost) AS min_cost
             FROM cost GROUP BY 1)
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
           c.unit_cost AS supply_cost
    FROM cost c
    JOIN best b ON b.l_partkey = c.l_partkey
                AND c.unit_cost = b.min_cost
    JOIN part p ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size IN (5, 15, 25, 35, 45) AND p.p_type = 'LARGE'
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey,
             s.s_suppkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (minimum-cost supplier): the correlated "
        "MIN-supplycost subquery decorrelates to a per-part MIN "
        "re-aggregation joined back on (partkey, cost) equality. The "
        "region filter prunes suppliers BEFORE the per-pair cost agg, "
        "every dim side broadcasts, and the join-back key includes the "
        "MIN value itself — exact, because MIN over identical float "
        "sets is bit-identical in any engine and any order. Top-100 "
        "rides a total ordering (acctbal desc then unique keys), so "
        "membership is deterministic",
)
def min_cost_supplier(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("uc"))
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = (T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
         .select("r_regionkey"))
    asia_supp = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
                 .join(F.broadcast(r), F.col("n_regionkey")
                       == F.col("r_regionkey"))
                 .select("s_suppkey"))
    cost = (li.join(dim_broadcast(asia_supp, sf_dir, "supplier"),
                    li.l_suppkey == F.col("s_suppkey"))
            .groupBy("l_partkey", "l_suppkey")
            .agg(F.min("uc").alias("unit_cost")))
    # rename at the source projection: `best` is derived FROM `cost`, and a
    # derived-agg join-back on the shared lineage trips Spark's ambiguous
    # self-join check unless the join keys carry fresh names
    best = (cost.groupBy(F.col("l_partkey").alias("bk"))
            .agg(F.min("unit_cost").alias("min_cost")))
    p = (T(spark, sf_dir, "part")
         .filter(F.col("p_size").isin(5, 15, 25, 35, 45)
                 & (F.col("p_type") == "LARGE"))
         .select("p_partkey"))
    sd = s.select(F.col("s_suppkey").alias("sk"), "s_name", "s_acctbal",
                  F.col("s_nationkey").alias("snk"))
    nd = n.select(F.col("n_nationkey").alias("nk"), "n_name")
    out = (cost.join(best, (cost.l_partkey == F.col("bk"))
                     & (cost.unit_cost == F.col("min_cost")))
           .drop("bk", "min_cost")
           .join(dim_broadcast(p, sf_dir, "part"), cost.l_partkey == p.p_partkey)
           .join(dim_broadcast(sd, sf_dir, "supplier"), F.col("l_suppkey") == F.col("sk"))
           .join(F.broadcast(nd), F.col("snk") == F.col("nk"))
           .select("s_acctbal", "s_name", "n_name", "p_partkey",
                   F.col("unit_cost").alias("supply_cost"),
                   F.col("sk").alias("s_suppkey")))
    return (out.orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                        "p_partkey", "s_suppkey")
            .limit(100)
            .drop("s_suppkey"))


@query(
    "forecast_revenue_delta",
    """
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue_delta
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecasting revenue change): a pure "
        "scan-filter-aggregate — all three predicates push into the "
        "parquet scan (min/max row-group skipping on shipdate), the "
        "projection carries two columns, and the only exchange is the "
        "final single-row reduce of an exact integer 1e-4-unit sum",
)
def forecast_revenue_delta(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_shipdate").cast("date")
                       >= F.lit("1997-01-01"))
                      & (F.col("l_shipdate").cast("date")
                         < F.lit("1998-01-01"))
                      & (F.col("l_discount") >= 0.05)
                      & (F.col("l_discount") <= 0.07)
                      & (F.col("l_quantity") < 24))
            .agg((F.sum(F.round(F.col("l_extendedprice")
                                * F.col("l_discount") * 10000)
                        .cast("bigint")).cast("double") / F.lit(10000.0))
                 .alias("revenue_delta")))


@query(
    "product_type_profit",
    f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) AS INT)
             AS o_year,
           CAST(SUM({_NET4_SQL}
                    - CAST(ROUND(p.p_retailprice * l.l_quantity * 1000)
                           AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape (product-type profit): profit = revenue minus a "
        "10%%-of-retail unit cost (ps_supplycost stand-in), rolled up by "
        "the supplier's nation and order year. part/supplier/nation "
        "broadcast; the LIKE predicate prunes the fact through the part "
        "join before the orders join; both money legs are exact integer "
        "1e-4-unit folds, so the profit sum is order-independent",
)
def product_type_profit(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        _net4().alias("net4"))
    p = (T(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
         .select("p_partkey", "p_retailprice"))
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = (F.col("net4")
              - F.round(F.col("p_retailprice") * F.col("l_quantity")
                        * 1000).cast("bigint"))
    return (li.join(dim_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
            .join(dim_broadcast(s, sf_dir, "supplier"), li.l_suppkey == s.s_suppkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(n), F.col("s_nationkey")
                  == F.col("n_nationkey"))
            .withColumn("amount4", amount)
            .groupBy(F.col("n_name").alias("nation"),
                     F.year(F.col("o_orderdate").cast("date"))
                     .alias("o_year"))
            .agg((F.sum("amount4").cast("double") / F.lit(10000.0))
                 .alias("sum_profit")))


@query(
    "returned_top_customers",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM({_NET4_SQL}) AS DOUBLE) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-10-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): revenue lost to "
        "returns per customer in one quarter, top 20. The quarter "
        "predicate prunes orders before the fact join, the returnflag "
        "predicate prunes lineitem at the scan, customer/nation "
        "broadcast, and the top-20 rides (exact integer revenue desc, "
        "custkey) — a total ordering, so membership never flips",
)
def returned_top_customers(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey")
    o = (T(spark, sf_dir, "orders")
         .filter((F.col("o_orderdate").cast("date") >= F.lit("1996-10-01"))
                 & (F.col("o_orderdate").cast("date") < F.lit("1997-01-01")))
         .select("o_orderkey", "o_custkey"))
    li = (T(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag") == "R")
          .select("l_orderkey", _net4().alias("net4")))
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(dim_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.sum("net4").alias("rev4"))
            .orderBy(F.col("rev4").desc(), "c_custkey")
            .limit(20)
            .select("c_custkey", "c_name", "n_name",
                    (F.col("rev4").cast("double") / F.lit(10000.0))
                    .alias("revenue")))


@query(
    "important_part_value",
    f"""
    WITH val AS (
      SELECT l.l_partkey, SUM({_NET4_SQL}) AS value4
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_5'
      GROUP BY 1
    ),
    tot AS (SELECT SUM(value4) AS total4 FROM val)
    SELECT v.l_partkey AS p_partkey,
           CAST(v.value4 AS DOUBLE) / 10000.0 AS part_value
    FROM val v CROSS JOIN tot
    WHERE v.value4 * 1000 > tot.total4
    """,
    doc="TPC-H Q11 shape (important stock identification): per-part "
        "traded value from one nation's suppliers, kept where the part "
        "exceeds 0.1%% of that nation's total. The global total is a "
        "one-row broadcast re-aggregated from the per-part sums (no "
        "second fact scan), and the threshold is evaluated as the EXACT "
        "integer cross-multiplication value4*1000 > total4 — no float "
        "fraction ever exists, so membership cannot flip at an engine "
        "boundary",
)
def important_part_value(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", _net4().alias("net4"))
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (T(spark, sf_dir, "nation")
         .filter(F.col("n_name") == "NATION_5").select("n_nationkey"))
    supp5 = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
             .select("s_suppkey"))
    val = (li.join(dim_broadcast(supp5, sf_dir, "supplier"), li.l_suppkey == F.col("s_suppkey"))
           .groupBy("l_partkey").agg(F.sum("net4").alias("value4")))
    # global total as an empty-partition window over the per-part AGGREGATE
    # (part-dim-sized, tiny next to the fact) — one fact scan, where a
    # separate .agg() branch would recompute the whole join subtree
    tot = F.sum("value4").over(Window.partitionBy())
    return (val.withColumn("total4", tot)
            .filter(F.col("value4") * 1000 > F.col("total4"))
            .select(F.col("l_partkey").alias("p_partkey"),
                    (F.col("value4").cast("double") / F.lit(10000.0))
                    .alias("part_value")))


@query(
    "supplier_cnt_by_part",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0.0)
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship): distinct "
        "suppliers per (brand, type, size) bucket, excluding "
        "negative-balance suppliers (the customer-complaints stand-in). "
        "The NOT IN is a broadcast anti join against a 100-row dim "
        "(null-safe: s_suppkey is non-null), the part predicates prune "
        "through a broadcast join, and COUNT(DISTINCT) is a two-phase "
        "partial-then-merge distinct agg — exact integers throughout",
)
def supplier_cnt_by_part(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (T(spark, sf_dir, "part")
         .filter((F.col("p_brand") != "Brand#1")
                 & (F.col("p_type") != "PROMO")
                 & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad = (T(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0.0).select("s_suppkey"))
    return (li.join(dim_broadcast(bad, sf_dir, "supplier"), li.l_suppkey == bad.s_suppkey,
                    "left_anti")
            .join(dim_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


@query(
    "surge_part_suppliers",
    """
    WITH shipped AS (
      SELECT l.l_suppkey, l.l_partkey,
             SUM(CASE WHEN CAST(l.l_shipdate AS DATE) >= DATE '1997-01-01'
                       AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
                      THEN CAST(ROUND(l.l_quantity) AS BIGINT)
                      ELSE 0 END) AS qty97,
             SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS qty_all
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small%'
      GROUP BY 1, 2
    )
    SELECT DISTINCT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
      AND EXISTS (SELECT 1 FROM shipped sh
                  WHERE sh.l_suppkey = s.s_suppkey
                    AND sh.qty97 * 2 > sh.qty_all)
    """,
    doc="TPC-H Q20 shape (potential part promotion): suppliers in one "
        "region who shipped more than half of a 'small%%' part's "
        "all-time volume inside 1997 (availqty>half-shipped stand-in "
        "without partsupp). The inner block aggregates the name-filtered "
        "fact once per (supplier, part) with a conditional sum — one "
        "scan for both the year slice and the all-time total — and the "
        "surge test is the exact integer cross-multiply qty97*2 > "
        "qty_all. EXISTS decorrelates to a LEFT SEMI join into the "
        "100-row supplier dim",
)
def surge_part_suppliers(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_shipdate",
        F.round("l_quantity").cast("bigint").alias("qty"))
    p = (T(spark, sf_dir, "part")
         .filter(F.col("p_name").like("small%")).select("p_partkey"))
    in97 = ((F.col("l_shipdate").cast("date") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01")))
    shipped = (li.join(dim_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
               .groupBy("l_suppkey", "l_partkey")
               .agg(F.sum(F.when(in97, F.col("qty")).otherwise(F.lit(0)))
                    .alias("qty97"),
                    F.sum("qty").alias("qty_all")))
    surge = (shipped.filter(F.col("qty97") * 2 > F.col("qty_all"))
             .select("l_suppkey").distinct())
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name",
                                            "s_nationkey")
    n = T(spark, sf_dir, "nation")
    r = (T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
         .select("r_regionkey"))
    return (s.join(surge, s.s_suppkey == surge.l_suppkey, "left_semi")
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), F.col("n_regionkey")
                  == F.col("r_regionkey"))
            .select("s_name", "n_name").distinct())


@query(
    "mv_incremental_merge",
    f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) AS INT)
             AS o_year,
           COUNT(*) AS n_lines,
           CAST(SUM({_NET4_SQL}) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    GROUP BY 1, 2
    """,
    doc="incremental materialized-view maintenance by partial-aggregate "
        "merge: the (nation, year) revenue MV is computed as base state "
        "(orders before 1999) MERGED with delta state (orders since) — "
        "union the two groups' (count, sum) partial states and re-sum per "
        "key, exactly how Spark merges map-side partials and how a "
        "warehouse refreshes an MV touching ONLY the delta partition "
        "(the base agg is orders-of-magnitude smaller than its facts). "
        "The oracle recomputes from scratch; merged == recomputed "
        "because count/sum are commutative monoids and the money leg is "
        "an exact integer 1e-4-unit sum. AVG-style measures derive from "
        "(sum, count) at read time — never stored, so they merge too",
)
def mv_incremental_merge(spark, sf_dir):
    cutoff = "1999-01-01"

    def agg_slice(pred):
        o = (T(spark, sf_dir, "orders").filter(pred)
             .select("o_orderkey", "o_custkey", "o_orderdate"))
        li = T(spark, sf_dir, "lineitem").select(
            "l_orderkey", _net4().alias("net4"))
        c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
        return (li.join(o, li.l_orderkey == o.o_orderkey)
                .join(dim_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
                .join(F.broadcast(n), F.col("c_nationkey")
                      == F.col("n_nationkey"))
                .groupBy(F.col("n_name").alias("nation"),
                         F.year(F.col("o_orderdate").cast("date"))
                         .alias("o_year"))
                .agg(F.count("*").alias("n_lines"),
                     F.sum("net4").alias("rev4")))

    # base takes NULL orderdates too: the two slices must PARTITION the
    # orders (a NULL date fails both < and >=, and a row landing in
    # neither slice would silently break merged == recomputed)
    base = agg_slice((F.col("o_orderdate").cast("date") < F.lit(cutoff))
                     | F.col("o_orderdate").isNull())
    delta = agg_slice(F.col("o_orderdate").cast("date") >= F.lit(cutoff))
    return (base.unionAll(delta)
            .groupBy("nation", "o_year")
            .agg(F.sum("n_lines").alias("n_lines"),
                 (F.sum("rev4").cast("double") / F.lit(10000.0))
                 .alias("revenue")))


# growth-law observability: rounds of the last agg_exact_median_selection
# histogram narrowing loop. Each round is one scan of the (range-filtered)
# remainder + a <=1024-row collect; rounds <= ceil(log_1024(value span)) is
# a DATA property independent of row count, pinned in
# tests/test_growth_laws.py so superlinear drift at a scale-up is caught.
_MEDIAN_ROUNDS_LAST = -1


@query(
    "agg_exact_median_selection",
    """
    SELECT CAST(c AS DOUBLE) / 100.0 AS median_price
    FROM (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
             ROW_NUMBER() OVER (ORDER BY CAST(ROUND(o_totalprice * 100)
                                              AS BIGINT)) AS rn,
             COUNT(*) OVER () AS n
      FROM orders
    ) t
    WHERE rn = (n + 1) // 2
    """,
    doc="EXACT median of a fact column WITHOUT a global sort: iterative "
        "histogram selection. Each round scans the (narrowed) range once, "
        "builds a 1024-bucket count histogram (one partial-aggregable "
        "groupBy; the collected histogram is metadata-sized, <=1025 rows "
        "— the documented bounded-collect pattern), and descends into the "
        "bucket containing the target rank; when the candidate range "
        "holds few rows, the exact k-th value falls out of a bounded "
        "sort. log_1024(n) rounds ~ 2-4 passes at ANY n — the way to take "
        "an exact percentile of a 100 TB column, vs the oracle's "
        "ROW_NUMBER global sort which is the thing that does NOT scale. "
        "Lower median on exact integer cents: deterministic selection of "
        "an existing value, bit-identical across engines",
)
def agg_exact_median_selection(spark, sf_dir):
    o = (T(spark, sf_dir, "orders")
         .select(F.round(F.col("o_totalprice") * 100).cast("bigint")
                 .alias("c")))
    o = o.persist()
    try:
        first = o.agg(F.min("c").alias("lo"), F.max("c").alias("hi"),
                      F.count("*").alias("n")).first()
        lo, hi, n = first["lo"], first["hi"], first["n"]
        k = (n + 1) // 2                    # 1-indexed rank of lower median
        n_buckets, leaf_rows = 1024, 4096
        cand = o
        global _MEDIAN_ROUNDS_LAST
        _MEDIAN_ROUNDS_LAST = 0
        while n > leaf_rows:
            _MEDIAN_ROUNDS_LAST += 1
            # histogram rounds keep running while the remainder is large;
            # once w reaches 1 each bucket IS a single value, so the rank
            # lookup terminates exactly — NEVER a driver-side sort of an
            # unbounded remainder (a narrow range over billions of rows,
            # e.g. heavily quantized prices, must not hit the leaf sort)
            span = hi - lo + 1
            w = max(1, (span + n_buckets - 1) // n_buckets)
            hist = (cand.filter((F.col("c") >= lo) & (F.col("c") <= hi))
                    .groupBy(((F.col("c") - lo) / w).cast("bigint")
                             .alias("b"))
                    .count().collect())
            counts = {int(r["b"]): r["count"] for r in hist}
            cum = 0
            for b in range(n_buckets + 1):
                cb = counts.get(b, 0)
                if cum + cb >= k:
                    lo, hi = lo + b * w, min(hi, lo + (b + 1) * w - 1)
                    k -= cum
                    n = cb
                    break
                cum += cb
            if w == 1:
                # the winning bucket is one exact value — done
                return spark.range(1).select(
                    (F.lit(int(lo)).cast("double") / F.lit(100.0))
                    .alias("median_price"))
        # leaf: exact k-th smallest of a remainder bounded by leaf_rows
        kth = (cand.filter((F.col("c") >= lo) & (F.col("c") <= hi))
               .orderBy("c").limit(int(k))
               .agg(F.max("c").alias("c")))
        return kth.select((F.col("c").cast("double") / F.lit(100.0))
                          .alias("median_price"))
    finally:
        o.unpersist()


@query(
    "agg_weighted_median",
    """
    WITH w AS (
      SELECT p.p_brand AS brand, p.p_size AS v,
             CAST(SUM(l.l_quantity) AS BIGINT) AS wt
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    c AS (
      SELECT brand, v, wt,
             SUM(wt) OVER (PARTITION BY brand ORDER BY v) AS cum,
             SUM(wt) OVER (PARTITION BY brand) AS tot
      FROM w
    )
    SELECT brand, CAST(MIN(v) AS BIGINT) AS weighted_median_size,
           CAST(MAX(tot) AS BIGINT) AS total_weight
    FROM c WHERE cum * 2 >= tot
    GROUP BY brand
    ORDER BY brand
    """,
    doc="exact WEIGHTED median: the part size at which half the shipped "
        "QUANTITY (not half the parts) lies below, per brand — the "
        "inventory-planning statistic plain percentile gets wrong "
        "whenever volume concentrates in a few SKUs. The fact scan "
        "collapses to (brand, size, Σqty) — value-domain-sized, so the "
        "two windows (running + total weight, both on ONE brand-keyed "
        "shuffle) never see raw lineitem rows. Selection is the integer "
        "cross-multiplication cum*2 >= tot on exact integer weights — "
        "no float division anywhere, hash-exact by construction. The "
        "same shape generalizes to any weighted percentile by replacing "
        "the factor 2",
)
def agg_weighted_median(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    w = (li.join(dim_broadcast(p.select("p_partkey", "p_brand", "p_size"), sf_dir, "part"),
                 F.col("l_partkey") == F.col("p_partkey"))
         .groupBy(F.col("p_brand").alias("brand"),
                  F.col("p_size").alias("v"))
         .agg(F.sum("l_quantity").cast("bigint").alias("wt")))
    run = (Window.partitionBy("brand").orderBy("v")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = Window.partitionBy("brand")
    c = (w.withColumn("cum", F.sum("wt").over(run))
         .withColumn("tot", F.sum("wt").over(tot)))
    return (c.filter(F.col("cum") * 2 >= F.col("tot"))
            .groupBy("brand")
            .agg(F.min("v").cast("bigint").alias("weighted_median_size"),
                 F.max("tot").cast("bigint").alias("total_weight"))
            .orderBy("brand"))
