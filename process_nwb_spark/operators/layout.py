"""Z-order (Morton) data layout: multi-dimensional clustering for scan
pruning.

The 100 TB story: parquet row-group and file skipping works off min/max
column statistics, which only prune on the SORT column of a linearly-sorted
layout. Interleaving the bits of two quantized dimensions into one Morton
key and range-partition-sorting on that key gives every file/row-group a
BOUNDED rectangle in (x, y) space — a filter on EITHER dimension then skips
most files, which is how lakehouse engines (Delta OPTIMIZE ZORDER BY,
Iceberg sort orders) cluster petabyte tables. Everything here is integer
bit arithmetic on the JVM (shiftleft/and/or inside whole-stage codegen) —
no UDF, no shuffle beyond the final range partitioner.

Determinism: the Morton key of a row is a pure integer function of its
quantized coordinates, so layouts (and the locality-stats query face) are
bit-identical across engines and partitionings.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MASKS = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333),
          (1, 0x55555555))


def spread16(c: Column) -> Column:
    """Spread the low 16 bits of `c` into the even bit positions of a
    32-bit value (Morton magic-mask sequence, 4 shift/mask rounds).

    Arithmetic runs in LONG: in a 32-bit int the final interleave would
    overflow the sign bit for y >= 2^15, flipping the key negative —
    breaking sort monotonicity AND diverging from the oracle's BIGINT
    arithmetic (caught by test_zorder_key_matches_numpy_interleave)."""
    c = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _MASKS:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def spread16_sql(expr: str) -> str:
    """The same spread as a dialect-portable SQL string (DuckDB oracle
    replay; `<<`, `&`, `|` are integer ops in both engines)."""
    out = f"(({expr}) & 65535)"
    for shift, mask in _MASKS:
        out = f"((({out}) | (({out}) << {shift})) & {mask})"
    return out


def zorder_key(x: Column, y: Column) -> Column:
    """32-bit Morton key interleaving two 16-bit quantized dimensions:
    x in the even bits, y in the odd bits."""
    return spread16(x).bitwiseOR(F.shiftleft(spread16(y), 1))


def zorder_key_sql(x_expr: str, y_expr: str) -> str:
    return (f"({spread16_sql(x_expr)} | "
            f"({spread16_sql(y_expr)} << 1))")


def write_zordered(df: DataFrame, path: str, x: Column, y: Column,
                   n_files: int = 32) -> None:
    """Lay `df` out on disk clustered by the Morton key of (x, y):
    range-partition into `n_files` key ranges (a sample-based partitioner —
    one pass, balanced files under any key skew), sort within each, drop
    the key. Every output file then covers a bounded (x, y) rectangle, so
    min/max stats prune scans filtered on either dimension."""
    (df.withColumn("_z", zorder_key(x, y))
     .repartitionByRange(n_files, "_z")
     .sortWithinPartitions("_z")
     .drop("_z")
     .write.mode("overwrite").parquet(path))


def parquet_file_rects(path: str, xcol: str, ycol: str):
    """Per-file (x_min, x_max, y_min, y_max) bounding rectangles from
    parquet FOOTER statistics — the exact metadata min/max pruning reads,
    so these rectangles ARE the layout's skipping behavior. Shared by the
    layout tests and the lakehouse demo."""
    import glob
    import os

    import pyarrow.parquet as pq

    rects = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        xs, ys = [], []
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            cols = {rg.column(i).path_in_schema: rg.column(i).statistics
                    for i in range(rg.num_columns)}
            xs += [cols[xcol].min, cols[xcol].max]
            ys += [cols[ycol].min, cols[ycol].max]
        if xs:
            rects.append((min(xs), max(xs), min(ys), max(ys)))
    return rects
