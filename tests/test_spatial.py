"""csd_reference / electrode_neighbors (operators/spatial.py) vs direct
NumPy evaluation on a 2-D grid, plus the isolated-electrode convention."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.operators.spatial import (csd_reference,
                                                 electrode_neighbors)


def _grid_electrodes(spark, nx, ny, pitch=1.0):
    rows = [(i * ny + j, i * pitch, j * pitch, 0.0)
            for i in range(nx) for j in range(ny)]
    return spark.createDataFrame(rows, "id INT, x DOUBLE, y DOUBLE, z DOUBLE")


def _sig(spark, X):
    n_t, n_ch = X.shape
    return spark.createDataFrame(pd.DataFrame({
        "series_id": "s0",
        "channel": np.tile(np.arange(n_ch, dtype=np.int32), n_t),
        "sample_idx": np.repeat(np.arange(n_t, dtype=np.int64), n_ch),
        "value": X.ravel()}))


def test_neighbors_grid_degrees(spark):
    el = _grid_electrodes(spark, 4, 4)
    deg = {r.id: r.n for r in
           electrode_neighbors(el, 1.1).groupBy("id")
           .agg(F.count("*").alias("n")).collect()}
    # 4-connected grid: corners 2, edges 3, interior 4
    assert deg[0] == 2 and deg[5] == 4 and deg[1] == 3
    assert len(deg) == 16
    # radius sqrt(2)+eps adds diagonals: interior degree 8
    deg8 = {r.id: r.n for r in
            electrode_neighbors(el, 1.5).groupBy("id")
            .agg(F.count("*").alias("n")).collect()}
    assert deg8[5] == 8


def test_csd_matches_numpy_on_grid(spark):
    rng = np.random.default_rng(19)
    nx, ny, n_t = 3, 3, 50
    X = rng.standard_normal((n_t, nx * ny))
    el = _grid_electrodes(spark, nx, ny)
    out = csd_reference(_sig(spark, X), el, radius=1.1).toPandas()
    assert len(out) == n_t * nx * ny
    pos = {i * ny + j: (i, j) for i in range(nx) for j in range(ny)}
    for _, r in out.iterrows():
        (ci, cj) = pos[r.channel]
        nbrs = [c for c, (i, j) in pos.items()
                if abs(i - ci) + abs(j - cj) == 1]
        assert r.n_neighbors == len(nbrs)
        want = X[r.sample_idx, r.channel] - np.mean(
            [X[r.sample_idx, c] for c in nbrs])
        assert r.csd == pytest.approx(want, abs=1e-12)


def test_csd_isolated_electrode_null_not_dropped(spark):
    # electrode 2 sits far away: no neighbors -> row kept, csd NULL
    el = spark.createDataFrame(
        [(0, 0.0, 0.0, 0.0), (1, 1.0, 0.0, 0.0), (2, 100.0, 0.0, 0.0)],
        "id INT, x DOUBLE, y DOUBLE, z DOUBLE")
    X = np.arange(12, dtype=np.float64).reshape(4, 3)
    out = csd_reference(_sig(spark, X), el, radius=1.5).toPandas()
    assert len(out) == 12                       # nothing dropped
    iso = out[out.channel == 2]
    assert (iso.n_neighbors == 0).all() and iso.csd.isna().all()
    pair = out[(out.channel == 0) & (out.sample_idx == 1)].iloc[0]
    assert pair.csd == pytest.approx(X[1, 0] - X[1, 1], abs=1e-12)
