#!/usr/bin/env python
"""Streaming preprocessing demo — the engine's answer to the reference's
chunked executor (ChannelBandIterator + iterative HDF5 write,
wavelet_transform.py:142-235): signal files LAND in a directory, each
micro-batch flows through notch -> CAR-subtract -> wavelet amplitude with
the bounded-memory segmented kernels, and a band-partitioned parquet sink
grows incrementally. Run it; it synthesizes a recording, lands it as two
files, streams them through, and prints the growing sink."""
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from process_nwb_spark import get_spark
from process_nwb_spark.streaming.ops import stream_preprocess_full
from process_nwb_spark.synth import generate_synthetic_data, to_long_df


def main():
    spark = get_spark("streaming-demo", shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="pnwb_stream_demo_")
    in_dir, out_dir = os.path.join(work, "landing"), os.path.join(work, "out")

    X = generate_synthetic_data(4.0, 4, 2000.0, seed=11)  # 8000 x 4 ch
    long_df = to_long_df(spark, X)
    for lo, hi in [(0, 4096), (4096, 8000)]:  # land on segment boundaries
        (long_df.filter((F.col("sample_idx") >= lo)
                        & (F.col("sample_idx") < hi))
         .coalesce(1).write.mode("append").parquet(in_dir))
    print(f"landed 2 files in {in_dir}")

    q = stream_preprocess_full(spark, in_dir, out_dir, rate=2000.0,
                               seg_len=2048, overlap=512)
    q.awaitTermination()

    out = spark.read.parquet(out_dir)
    print("sink rows:", out.count(), "micro-batches:",
          out.select("_batch").distinct().count())
    (out.groupBy("band").agg(
        F.count("*").alias("n"),
        F.round(F.avg("amp"), 4).alias("mean_amplitude"))
     .orderBy("band").show())

    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
