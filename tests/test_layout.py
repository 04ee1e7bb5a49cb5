"""Z-order layout: Morton-key correctness vs a NumPy bit-interleave
replay, and the on-disk locality contract — every file written by
write_zordered covers a bounded rectangle in BOTH dimensions, which is the
property parquet min/max pruning needs. A linear time-sorted layout of the
same data fails the x-dimension bound, proving the interleave (not the
sort) is what buys two-dimensional locality."""
import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.operators.layout import (spread16, write_zordered,
                                                zorder_key)
from tests.conftest import SF_CORRECT


def _np_spread16(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64) & 0xFFFF
    for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                        (2, 0x33333333), (1, 0x55555555)):
        v = (v | (v << shift)) & mask
    return v


def test_zorder_key_matches_numpy_interleave(spark):
    rng = np.random.default_rng(7)
    x = rng.integers(0, 65536, 500)
    y = rng.integers(0, 65536, 500)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, y)], "x int, y int")
    got = np.array([r.z for r in
                    df.select(zorder_key(F.col("x"), F.col("y"))
                              .alias("z")).collect()])
    want = _np_spread16(x) | (_np_spread16(y) << 1)
    assert np.array_equal(np.sort(got), np.sort(want))
    # interleave is a bijection on the 32-bit grid
    assert len({int(v) for v in want}) == len(want)


def test_spread16_even_bits_only(spark):
    df = spark.range(0, 65536, 4097).select(
        spread16(F.col("id").cast("int")).alias("s"))
    for r in df.collect():
        assert (r.s & 0xAAAAAAAA) == 0, "spread must land on even bits"


def _file_rects(path):
    """(x_range, y_range) per parquet file from its row-group stats."""
    import glob
    import os
    rects = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        xs, ys = [], []
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            cols = {rg.column(i).path_in_schema: rg.column(i).statistics
                    for i in range(rg.num_columns)}
            xs += [cols["xq"].min, cols["xq"].max]
            ys += [cols["yq"].min, cols["yq"].max]
        if xs:
            rects.append((max(xs) - min(xs), max(ys) - min(ys)))
    return rects


@pytest.mark.parametrize("n_files", [16])
def test_zordered_files_are_bounded_rectangles(spark, tmp_path, n_files):
    e = (spark.read.parquet(f"{SF_CORRECT}/events.parquet")
         .select(((F.col("user_id") * 439).bitwiseAND(F.lit(65535))
                  .cast("int")).alias("xq"),
                 F.expr("CAST((unix_timestamp(ts) - 1704067200) DIV 60 "
                        "AS INT)").alias("yq")))
    zpath = str(tmp_path / "zordered")
    write_zordered(e, zpath, F.col("xq"), F.col("yq"), n_files=n_files)
    rects = _file_rects(zpath)
    assert len(rects) >= n_files // 2
    x_span = 149 * 439  # user_id domain scaled into 16 bits
    zx = sorted(r[0] for r in rects)
    # z-clustered files fix the top interleaved bits, so the typical file
    # covers a small x slice even though the sort key is 2-D
    assert zx[len(zx) // 2] <= x_span * 0.5, zx

    # the counter-layout: linear sort by time alone leaves the user
    # dimension unbounded in every file
    lpath = str(tmp_path / "linear")
    (e.repartitionByRange(n_files, "yq").sortWithinPartitions("yq")
     .write.mode("overwrite").parquet(lpath))
    lin = sorted(r[0] for r in _file_rects(lpath))
    assert lin[len(lin) // 2] >= x_span * 0.9, \
        "time-sorted layout should NOT bound the user dimension"
    # and the z layout's median user-range beats linear by a wide margin
    assert zx[len(zx) // 2] * 2 < lin[len(lin) // 2]
