"""Z-order layout: Morton-key correctness vs a NumPy bit-interleave
replay, and the on-disk locality contract — every file written by
write_zordered covers a bounded rectangle in BOTH dimensions, which is the
property parquet min/max pruning needs. A linear time-sorted layout of the
same data fails the x-dimension bound, proving the interleave (not the
sort) is what buys two-dimensional locality."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.operators.layout import (parquet_file_rects,
                                                spread16, write_zordered,
                                                zorder_key)
from process_nwb_spark.relational.dataprep import zorder_quantize_events
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


@pytest.mark.parametrize("n_files", [16])
def test_zordered_files_are_bounded_rectangles(spark, tmp_path, n_files):
    e = zorder_quantize_events(
        spark.read.parquet(f"{SF_CORRECT}/events.parquet"))
    zpath = str(tmp_path / "zordered")
    write_zordered(e, zpath, F.col("xq"), F.col("yq"), n_files=n_files)
    rects = [(xmax - xmin, ymax - ymin) for xmin, xmax, ymin, ymax
             in parquet_file_rects(zpath, "xq", "yq")]
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
    lin = sorted(xmax - xmin for xmin, xmax, _, _
                 in parquet_file_rects(lpath, "xq", "yq"))
    assert lin[len(lin) // 2] >= x_span * 0.9, \
        "time-sorted layout should NOT bound the user dimension"
    # and the z layout's median user-range beats linear by a wide margin
    assert zx[len(zx) // 2] * 2 < lin[len(lin) // 2]
