"""SQL-planner surface (SURVEY.md §2C extensions): subqueries (EXISTS /
NOT EXISTS / nested IN / scalar / correlated-scalar), pivot & unpivot,
ordered-set aggregates (median / percentile_cont / percentile_disc /
listagg), regression aggregates (corr / covar / regr_*), try_* safe
arithmetic, and a recursive CTE (new in Spark 4).

These exercise Catalyst's subquery decorrelation: EXISTS / IN rewrite to
left-semi joins, NOT EXISTS to left-anti, an uncorrelated scalar subquery
to a single-row broadcast, and a correlated scalar subquery to an
aggregate + outer join — so at 100 TB each one costs exactly the join it
decorrelates into (broadcast where the inner side is a dim table), never
a per-row re-execution. Everything here is JVM built-ins inside
whole-stage codegen; no UDFs.

Queries whose natural authoring surface is SQL text (WITHIN GROUP,
WITH RECURSIVE, correlated subqueries) run through ``spark.sql`` over
temp views — the engine's SQL face — with the same text-level semantics
DuckDB replays.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from .core import T, query


def _views(spark, sf_dir, *names):
    for t in names:
        T(spark, sf_dir, t).createOrReplaceTempView(t)


# --------------------------------------------------------------------------
# Subqueries
# --------------------------------------------------------------------------
_EXISTS_SQL = """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o.o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
"""


@query(
    "sub_exists_returned",
    _EXISTS_SQL,
    doc="correlated EXISTS (TPC-H Q4 shape): orders with >=1 returned "
        "line, counted per priority. Catalyst decorrelates to a left-semi "
        "hash join on l_orderkey followed by a partial-aggregated count — "
        "one shuffle pair, no per-row subquery execution",
)
def sub_exists_returned(spark, sf_dir):
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_EXISTS_SQL)


# predicate includes the priority filter: every fixture customer HAS
# orders, so the unfiltered "never ordered" set was empty at every SF —
# a vacuous 0==0 hash check. "never placed an URGENT order" is real.
_NOT_EXISTS_SQL = """
    SELECT c_nationkey, COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c.c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
"""


@query(
    "sub_not_exists_customers",
    _NOT_EXISTS_SQL,
    doc="correlated NOT EXISTS: customers who never placed an urgent "
        "order, per nation. Decorrelates to a left-anti join on the "
        "order foreign key",
)
def sub_not_exists_customers(spark, sf_dir):
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_NOT_EXISTS_SQL)


# threshold factor 1.03: the fixture's price spread tops out at
# max/avg ~= 1.05, so the historical 1.5x matched ZERO rows at every
# SF — a vacuous 0==0 hash check. 1.03x selects a real top slice.
_SCALAR_SQL = """
    SELECT p_partkey, p_brand, ROUND(p_retailprice, 2) AS price
    FROM part
    WHERE p_retailprice > 1.03 * (SELECT AVG(p_retailprice) FROM part)
"""


@query(
    "sub_scalar_threshold",
    _SCALAR_SQL,
    doc="uncorrelated scalar subquery as a filter threshold: parts priced "
        "above 1.5x the global mean. The inner aggregate runs once and is "
        "broadcast into the scan's filter — at 100 TB this is one extra "
        "tiny job, then a narrow pushed-down predicate",
)
def sub_scalar_threshold(spark, sf_dir):
    _views(spark, sf_dir, "part")
    return spark.sql(_SCALAR_SQL)


_IN_SQL = """
    SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS bal
    FROM supplier
    WHERE s_nationkey IN (
        SELECT n_nationkey FROM nation WHERE n_regionkey IN (
            SELECT r_regionkey FROM region
            WHERE r_name IN ('ASIA', 'EUROPE')))
"""


@query(
    "sub_in_region_suppliers",
    _IN_SQL,
    doc="two-level nested IN over the region->nation dim chain. Both IN "
        "subqueries rewrite to left-semi joins against dim tables small "
        "enough to broadcast at any scale",
)
def sub_in_region_suppliers(spark, sf_dir):
    _views(spark, sf_dir, "supplier", "nation", "region")
    return spark.sql(_IN_SQL)


_CORR_SCALAR_SQL = """
    SELECT n_nationkey, n_name,
           (SELECT COUNT(*) FROM customer
            WHERE c_nationkey = n_nationkey) AS n_cust,
           (SELECT COUNT(*) FROM supplier
            WHERE s_nationkey = n_nationkey) AS n_supp
    FROM nation
"""


@query(
    "sub_scalar_correlated",
    _CORR_SCALAR_SQL,
    doc="correlated scalar subqueries in the SELECT list: per-nation "
        "customer and supplier counts. Catalyst rewrites each to "
        "(pre-aggregated count by key) LEFT OUTER JOIN nation — two "
        "grouped aggregates + broadcast joins, not 25x2 probe queries",
)
def sub_scalar_correlated(spark, sf_dir):
    _views(spark, sf_dir, "nation", "customer", "supplier")
    return spark.sql(_CORR_SCALAR_SQL)


# --------------------------------------------------------------------------
# Pivot / unpivot
# --------------------------------------------------------------------------
@query(
    "pivot_qty_by_flag",
    """
    SELECT l_linestatus,
           ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2)
               AS qty_a,
           ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2)
               AS qty_n,
           ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2)
               AS qty_r
    FROM lineitem
    GROUP BY l_linestatus
    """,
    doc="pivot: quantity totals spread to one column per return flag. "
        "With explicit pivot values Spark plans one partial-aggregated "
        "pass over the facts grouped by (group, pivot) then a PivotFirst "
        "re-aggregation over only |groups x values| rows — the second "
        "shuffle is O(result), and no distinct-discovery scan is needed",
)
def pivot_qty_by_flag(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    piv = (li.groupBy("l_linestatus")
           .pivot("l_returnflag", ["A", "N", "R"])
           .agg(F.round(F.sum("l_quantity"), 2)))
    return piv.select(
        "l_linestatus",
        F.col("A").alias("qty_a"),
        F.col("N").alias("qty_n"),
        F.col("R").alias("qty_r"),
    )


@query(
    "unpivot_part_measures",
    """
    SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS value
    FROM part
    """,
    doc="unpivot (wide->long): part measures melted to (measure, value) "
        "rows. Spark's unpivot is a narrow Expand node — each input row "
        "emits k rows in place, no shuffle and a single scan (the UNION "
        "ALL oracle scans twice; ours is strictly cheaper)",
)
def unpivot_part_measures(spark, sf_dir):
    p = T(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"))
    return p.unpivot("p_partkey", ["size", "retailprice"],
                     "measure", "value")


# --------------------------------------------------------------------------
# Ordered-set + regression aggregates
# --------------------------------------------------------------------------
_QUANTILES_SQL = """
    SELECT l_returnflag,
           ROUND(MEDIAN(l_quantity), 4) AS med_qty,
           ROUND(PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY l_quantity),
                 4) AS q1,
           ROUND(PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY l_quantity),
                 4) AS q3,
           ROUND(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY l_quantity),
                 4) AS med_disc
    FROM lineitem
    GROUP BY l_returnflag
"""


@query(
    "agg_ordered_quantiles",
    _QUANTILES_SQL,
    doc="ordered-set aggregates: exact median, interpolated quartiles "
        "(percentile_cont), and percentile_disc. Exact percentiles "
        "buffer per-group values — fine at 3 groups; the pre-existing "
        "agg_percentiles entry is the sketch-based scale path "
        "(percentile_approx) for high-cardinality groups",
)
def agg_ordered_quantiles(spark, sf_dir):
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_QUANTILES_SQL)


_LISTAGG_SQL_SPARK = """
    SELECT r_name,
           LISTAGG(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
"""

_LISTAGG_SQL_DUCK = """
    SELECT r_name,
           STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
"""


@query(
    "agg_listagg_nations",
    _LISTAGG_SQL_DUCK,
    doc="listagg / string_agg (Spark 4's LISTAGG ... WITHIN GROUP vs "
        "DuckDB's STRING_AGG ... ORDER BY): nation names concatenated "
        "per region with a deterministic order. List-valued per group — "
        "safe on grouped dims, not on unbounded groups",
)
def agg_listagg_nations(spark, sf_dir):
    _views(spark, sf_dir, "nation", "region")
    return spark.sql(_LISTAGG_SQL_SPARK)


@query(
    "agg_regression_stats",
    """
    SELECT l_returnflag,
           ROUND(CORR(l_extendedprice, l_quantity), 6) AS corr_pq,
           ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 2) AS covar_s,
           ROUND(COVAR_POP(l_extendedprice, l_quantity), 2) AS covar_p,
           ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4)
               AS intercept,
           ROUND(REGR_R2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="bivariate statistical aggregates: correlation, sample/population "
        "covariance, least-squares slope/intercept/r2. All single-pass "
        "moment accumulators with partial aggregation (map-side combine) "
        "— constant state per group, linear scan at any scale",
)
def agg_regression_stats(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    p, q = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(p, q), 6).alias("corr_pq"),
        F.round(F.covar_samp(p, q), 2).alias("covar_s"),
        F.round(F.covar_pop(p, q), 2).alias("covar_p"),
        F.round(F.regr_slope(p, q), 4).alias("slope"),
        F.round(F.regr_intercept(p, q), 4).alias("intercept"),
        F.round(F.regr_r2(p, q), 6).alias("r2"),
        F.regr_count(p, q).cast("bigint").alias("n"),
    )


# --------------------------------------------------------------------------
# try_* safe arithmetic
# --------------------------------------------------------------------------
@query(
    "fn_try_arith",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice / NULLIF(l_discount, 0), 2)
               AS price_per_discount,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
           ROUND(l_quantity / NULLIF(l_tax, 0), 2) AS qty_per_tax
    FROM lineitem
    WHERE l_orderkey % 7 = 0
    """,
    doc="try_* safe arithmetic: try_divide yields NULL on zero divisors "
        "(DuckDB oracle spells it x / NULLIF(y, 0)) and try_cast yields "
        "NULL on malformed input instead of failing the job — the "
        "dirty-data posture for 100 TB ingest where one bad row must not "
        "kill a 1000-executor stage. Pure narrow projection",
)
def fn_try_arith(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 7 == 0)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.try_divide("l_extendedprice", "l_discount"), 2)
        .alias("price_per_discount"),
        F.try_to_number(F.col("l_returnflag"), F.lit("999"))
        .cast("int").alias("flag_as_int"),
        F.round(F.try_divide("l_quantity", "l_tax"), 2)
        .alias("qty_per_tax"),
    )


# --------------------------------------------------------------------------
# Recursive CTE (Spark 4)
# --------------------------------------------------------------------------
_RECURSIVE_SQL = """
    WITH RECURSIVE months(mth) AS (
        SELECT 1
        UNION ALL
        SELECT mth + 1 FROM months WHERE mth < 12
    )
    SELECT mth, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
    FROM months
    LEFT JOIN orders
      ON CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) = mth
    GROUP BY mth
"""


@query(
    "sql_recursive_months",
    _RECURSIVE_SQL,
    doc="recursive CTE (WITH RECURSIVE, new in Spark 4): generate a "
        "12-row month ladder iteratively, then left-join order counts so "
        "empty months still appear (COUNT(col) is null-skipping). The "
        "recursion materializes driver-side-small iterations; the big "
        "side stays one scan + one broadcast join",
)
def sql_recursive_months(spark, sf_dir):
    _views(spark, sf_dir, "orders")
    return spark.sql(_RECURSIVE_SQL)


@query(
    "lateral_topk_orders",
    """
    SELECT c.c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 2) AS price
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice
                  FROM orders
                  WHERE o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey
                  LIMIT 2) t
    WHERE c.c_custkey % 10 = 0
    """,
    doc="correlated LATERAL subquery (Spark 3.2+ SQL): per customer, the "
        "top-2 orders by price. Catalyst decorrelates the per-row "
        "ORDER BY ... LIMIT into a windowed rank over ONE orders shuffle "
        "— the per-key-top-k plan — rather than executing the subquery "
        "once per outer row (which would be O(customers) scans). Same "
        "semantics as win_topk_per_group, exercised through the SQL "
        "planner's lateral-join path",
)
def lateral_topk_orders(spark, sf_dir):
    T(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    T(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    return spark.sql("""
        SELECT c.c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 2) AS price
        FROM _lat_customer c,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM _lat_orders
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 2) t
        WHERE c.c_custkey % 10 = 0
    """)


@query(
    "sql_scripting_loop",
    """
    WITH b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
               FROM orders)
    SELECT CAST(FLOOR(LOG2(hi / lo)) AS INT) AS n_doublings,
           ROUND(lo, 2) AS min_price, ROUND(hi, 2) AS max_price
    FROM b
    """,
    doc="SQL scripting (Spark 4 BEGIN/DECLARE/WHILE): a procedural loop "
        "counts how many exact doublings fit between the min and max "
        "order price. Control flow runs on the DRIVER between regular "
        "Catalyst statements — each SET's subquery is a normal optimized "
        "job, so scripting adds orchestration, not a new execution tier. "
        "The oracle states the closed form (floor log2 of the ratio; "
        "doubling is exact in floats so the forms agree). Covers the "
        "stored-procedure-migration surface",
)
def sql_scripting_loop(spark, sf_dir):
    T(spark, sf_dir, "orders").createOrReplaceTempView("_scr_orders")
    return spark.sql("""
        BEGIN
          DECLARE lo DOUBLE;
          DECLARE hi DOUBLE;
          DECLARE k INT DEFAULT 0;
          SET lo = (SELECT MIN(o_totalprice) FROM _scr_orders);
          SET hi = (SELECT MAX(o_totalprice) FROM _scr_orders);
          WHILE lo * 2 <= hi DO
            SET lo = lo * 2;
            SET k = k + 1;
          END WHILE;
          SELECT k AS n_doublings,
                 ROUND((SELECT MIN(o_totalprice) FROM _scr_orders), 2)
                     AS min_price,
                 ROUND(hi, 2) AS max_price;
        END
    """)


@query(
    "sql_pipe_syntax",
    """
    SELECT event_type, COUNT(*) AS n,
           ROUND(SUM(CAST(value AS DOUBLE)), 2) AS total_value
    FROM events
    WHERE value > 50
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Spark 4 SQL pipe syntax (|>): linear FROM -> WHERE -> AGGREGATE "
        "-> ORDER BY dataflow that parses to exactly the same Catalyst "
        "plan as the nested-SELECT formulation — same pushdown, same "
        "partial aggregation; purely surface-level, so the oracle is the "
        "classic SQL spelling",
)
def sql_pipe_syntax(spark, sf_dir):
    T(spark, sf_dir, "events").createOrReplaceTempView("events_pipe")
    return spark.sql("""
        FROM events_pipe
        |> WHERE value > 50
        |> AGGREGATE COUNT(*) AS n,
                     ROUND(SUM(CAST(value AS DOUBLE)), 2) AS total_value
           GROUP BY event_type
        |> SELECT event_type, n, total_value
        |> ORDER BY event_type
    """)


@query(
    "sql_udf_scalar",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(CAST(SUM(
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
             * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))
           ) AS DOUBLE) / 10000.0, 2) AS net_revenue
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="SQL-defined scalar functions (Spark 4 CREATE FUNCTION ... "
        "RETURN <expr>): the net-revenue expression packaged as a "
        "reusable SQL UDF and applied inside an aggregation — the "
        "semantic-layer mechanism that lets analysts share exact "
        "business logic without shipping Python. Catalyst INLINES the "
        "function body into the plan (it is an expression substitution, "
        "not a call), so the aggregate stays whole-stage-codegen with "
        "map-side partial agg — zero overhead vs writing the expression "
        "in place, which is exactly what the oracle replays textually. "
        "The body computes in integer cent-percent units "
        "(cents x (100 - disc_pct)), so SUM is an exact bigint fold and "
        "the single display division is deterministic — the same exact-"
        "money discipline as the TPC-H faces",
)
def sql_udf_scalar(spark, sf_dir):
    _views(spark, sf_dir, "lineitem")
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION net_cp(
            price DOUBLE, disc DOUBLE) RETURNS BIGINT
        RETURN CAST(FLOOR(price * 100 + 0.5) AS BIGINT)
               * (100 - CAST(FLOOR(disc * 100 + 0.5) AS BIGINT))
    """)
    return spark.sql("""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               ROUND(CAST(SUM(net_cp(l_extendedprice, l_discount))
                     AS DOUBLE) / 10000.0, 2) AS net_revenue
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """)


_GBALL_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_orderkey % 7 = 0
    GROUP BY ALL
"""


@query(
    "sql_group_by_all",
    _GBALL_SQL,
    doc="GROUP BY ALL (Spark 3.4+ / DuckDB): the grouping keys are "
        "inferred as every non-aggregate select item — the same SQL "
        "text runs verbatim on both engines, so the face pins that the "
        "inference resolves to the identical key set (a divergence "
        "would hash-mismatch). Plans exactly like the explicit "
        "GROUP BY: one partial-agg shuffle",
)
def sql_group_by_all(spark, sf_dir):
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_GBALL_SQL)
