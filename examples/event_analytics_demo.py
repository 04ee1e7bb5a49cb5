#!/usr/bin/env python
"""Event-analytics demo: the warehouse-side face of the engine on the
`events` stream table — conversion funnel, cohort retention, forward-fill
and linear interpolation, SCD2 history + point-in-time enrichment, and a
data-quality gate. Every operator here is a registry query with a DuckDB
oracle (see COVERAGE.md); this script just strings them into the dashboard
a product team would actually run."""
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from process_nwb_spark import get_spark
from process_nwb_spark.relational.core import all_queries

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark("event-analytics-demo")
    q = all_queries()

    print("== conversion funnel (view -> click -> purchase) ==")
    q["funnel_conversion"].fn(spark, SF).show(truncate=False)

    print("== weekly cohort retention ==")
    (q["retention_cohorts"].fn(spark, SF)
     .orderBy("cohort_week", "week_offset").show(20, truncate=False))

    print("== 6-hour grid, linearly interpolated (first user) ==")
    interp = q["ts_linear_interp"].fn(spark, SF)
    row = interp.select("user_id").orderBy("user_id").first()
    if row is None:
        print("(no interpolated rows at this SF)")
    else:
        (interp.filter(F.col("user_id") == row["user_id"])
         .orderBy("grid_ts").show(12, truncate=False))

    print("== SCD2 order-status history (one customer) ==")
    scd = q["scd2_status_history"].fn(spark, SF)
    ck_row = scd.select("custkey").orderBy("custkey").first()
    if ck_row is None:
        print("(no order history at this SF)")
    else:
        (scd.filter(F.col("custkey") == ck_row["custkey"])
         .orderBy("valid_from").show(truncate=False))

    print("== data-quality gate ==")
    q["dq_audit"].fn(spark, SF).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
