"""Time individual registry faces in isolation (optimization-round harness).

Usage: python scripts/time_faces.py <name> [name ...]
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  TIME_FACES_PASSES    passes per face (default 5; min + median reported)

Methodology = the bench's (guide §1.4): each pass builds the face from the
registry callable and drives it through the noop sink, so build-time eager
actions (localCheckpoint rounds in the graph tier) are inside the timed
region exactly as bench.py times them; persist slots are cleared between
passes so min-of-N is never flattered by a warm cache.
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
    passes = int(os.environ.get("TIME_FACES_PASSES", "5"))

    from process_nwb_spark.session import get_spark
    from process_nwb_spark.relational.core import (all_queries,
                                                   clear_persist_slots)

    spark = get_spark("time-faces")
    registry = all_queries()
    out = {}
    for name in names:
        fn = registry[name].fn
        # one untimed warmup so JIT/scan-cache states match the bench's
        # steady state (bench interleaves passes; first-touch is excluded
        # by min-of-N there too)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        clear_persist_slots()
        ts = []
        for _ in range(passes):
            t0 = time.monotonic()
            spark.sparkContext.setJobDescription(f"time:{name}")
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            clear_persist_slots()
        out[name] = {"min": min(ts), "median": statistics.median(ts),
                     "all": ts}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
