"""Cold-JVM face timing — replicate the DRIVER's bench conditions.

Usage: python scripts/cold_face_bench.py <name> [name ...]
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  COLD_BENCH_RUNS      interleaved passes (default 5; median + min reported)

Unlike scripts/time_faces.py (warm, per-face, untimed warmup pass), this
matches bench.py's main loop exactly as the driver runs it: ONE fresh JVM,
the bench's generic session warm-up only (range-sum + nation collect — no
per-face warm pass), then N interleaved passes over the faces with the noop
sink and clear_persist_slots() between faces. Median-of-N is the driver's
basis; each invocation is one cold sample, so A/Bs alternate invocations
(conf on/off, both orders) rather than comparing within a session.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("COLD_BENCH_RUNS", "5"))

    from process_nwb_spark.session import get_spark
    from process_nwb_spark.relational.core import (all_queries,
                                                   clear_persist_slots)

    spark = get_spark("cold-face-bench", **{
        "spark.driver.extraJavaOptions": "-Xlog:disable",
        "spark.driver.memory": os.environ.get(
            "SPARK_GRAFT_BENCH_DRIVER_MEM", "32g")})
    registry = all_queries()

    # bench.py's session warm-up, verbatim (codegen + parquet reader paths)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/nation.parquet").collect()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        for name in names:
            df = registry[name].fn(spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(time.time() - t0)
            clear_persist_slots()
    out = {n: {"median": round(statistics.median(v), 3),
               "min": round(min(v), 3),
               "all": [round(x, 3) for x in v]}
           for n, v in samples.items()}
    out["_conf"] = {
        "cachedPlanAQE": spark.conf.get(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"),
        "sf_dir": sf_dir, "runs": runs}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
