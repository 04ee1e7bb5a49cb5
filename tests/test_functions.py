"""Direct tests for the standalone UDF surface (functions/udfs.py)."""
import numpy as np
from pyspark.sql import functions as F

from process_nwb_spark.functions import dot_product, l2_norm


def test_scalar_pandas_udfs(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0], [1.0, 0.0]), (2, [6.0, 8.0], [0.0, 2.0])],
        "id INT, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>")
    out = {r.id: (r.n, r.d) for r in df.select(
        "id", l2_norm("a").alias("n"), dot_product("a", "b").alias("d")
    ).collect()}
    assert np.isclose(out[1][0], 5.0) and np.isclose(out[1][1], 3.0)
    assert np.isclose(out[2][0], 10.0) and np.isclose(out[2][1], 16.0)


def test_udfs_are_arrow_vectorized(spark):
    """The scalar UDFs must run as ArrowEvalPython (pandas batches), not
    row-at-a-time BatchEvalPython."""
    from process_nwb_spark.plans.inspect import formatted_plan

    df = spark.createDataFrame([(1, [1.0])], "id INT, a ARRAY<DOUBLE>")
    plan = formatted_plan(df.select(l2_norm("a")), "simple")
    assert "ArrowEvalPython" in plan, plan


def test_hll_sketch_estimate_close_to_exact(spark):
    """The day-sketch -> union -> estimate rollup must land within HLL
    error bounds of the exact distinct count (lgConfigK=14 -> ~0.8% rse;
    allow 5%). Also proves mergeability: union of per-day sketches equals
    one estimate over the raw column."""
    from pyspark.sql import functions as F
    from process_nwb_spark.relational.core import T, all_queries

    sf = "/root/testdata/sf0.01"
    e = T(spark, sf, "events")
    # the raw estimate (the registry query projects the oracled tolerance
    # boolean instead; the estimate's accuracy contract is pinned here)
    daily = (e.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.hll_sketch_agg("user_id", 14).alias("sk")))
    approx = {r["event_type"]: r["approx_users"]
              for r in daily.groupBy("event_type")
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                   .alias("approx_users")).collect()}
    exact = {r["event_type"]: r["n"]
             for r in e.groupBy("event_type")
             .agg(F.count_distinct("user_id").alias("n")).collect()}
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(1, 0.05 * n), (et, approx[et], n)
    # and the registry query's own tolerance flags are all green
    rows = all_queries()["agg_hll_sketch"].fn(spark, sf).collect()
    assert rows and all(r["approx_ok"] == 1 for r in rows)
