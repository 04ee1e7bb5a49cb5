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
