"""Spatial re-referencing against the electrode geometry — current
source density (CSD) / local-Laplacian referencing: subtract from each
channel the mean of its spatial NEIGHBORS, not the global (trimmed)
mean like CAR. The electrode dimension table (id, x, y, z — the
reference's utils.py:222-253 table, SURVEY.md §1.2) finally gets used
for what it is: a dimension whose self-join defines the adjacency.

Plan (2 linear shuffles, no Python crossing):

1. neighbor pairs: self-join the ELECTRODE DIM on pairwise distance <=
   radius (a model-sized table — n_ch^2 pairs at worst — built once and
   broadcast);
2. neighbor gather: broadcast-join signals to the pair table on
   channel == nbr, then ONE groupBy (series, center, sample_idx) mean —
   each signal row fans out only to the channels it neighbors
   (bounded by the grid degree, ~4-8);
3. re-reference: equi-join the neighbor means back on
   (series, channel, sample_idx) — at scale both sides are partitioned
   by the same keys and the join is co-located.

Channels with no neighbor inside `radius` keep their raw value with
n_neighbors = 0 and csd NULL — dropping an edge electrode silently
would bias downstream channel counts.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def electrode_neighbors(electrodes: DataFrame, radius: float) -> DataFrame:
    """(id, nbr) pairs with 0 < distance((x,y,z)) <= radius — the
    adjacency relation of the electrode grid. Dimension-sized; callers
    broadcast it."""
    a = electrodes.select(F.col("id").alias("id"),
                          F.col("x").alias("ax"), F.col("y").alias("ay"),
                          F.col("z").alias("az"))
    b = electrodes.select(F.col("id").alias("nbr"),
                          F.col("x").alias("bx"), F.col("y").alias("by"),
                          F.col("z").alias("bz"))
    d2 = ((F.col("ax") - F.col("bx")) ** 2
          + (F.col("ay") - F.col("by")) ** 2
          + (F.col("az") - F.col("bz")) ** 2)
    r2 = float(radius) ** 2
    return (a.join(b, (F.col("id") != F.col("nbr")) & (d2 <= F.lit(r2)))
            .select("id", "nbr"))


def csd_reference(signals: DataFrame, electrodes: DataFrame,
                  radius: float, value_col: str = "value") -> DataFrame:
    """Local-Laplacian (CSD) referencing: value minus the mean of the
    spatial neighbors at the same timepoint.

    signals:    long (series_id, channel, sample_idx, <value_col>).
    electrodes: (id, x, y, z) dimension; channel joins id.
    Returns (series_id, channel, sample_idx, <value_col>, n_neighbors,
    csd) — csd NULL where the electrode has no neighbor within radius.
    """
    pairs = electrode_neighbors(electrodes, radius)
    v = F.col(value_col)
    # rename at the source projection: nbr_vals derives from `signals`,
    # and a self-join on same-named lineage columns is ambiguous
    donors = signals.select(F.col("series_id").alias("_sid"),
                            F.col("channel").alias("_ch"),
                            F.col("sample_idx").alias("_idx"),
                            v.alias("_v"))
    nbr_vals = (donors.join(F.broadcast(pairs),
                            F.col("_ch") == F.col("nbr"))
                .groupBy("_sid", F.col("id").alias("_center"), "_idx")
                .agg(F.avg("_v").alias("_nbr_mean"),
                     F.count(F.lit(1)).alias("n_neighbors")))
    j = signals.join(
        nbr_vals,
        (F.col("series_id") == F.col("_sid"))
        & (F.col("channel") == F.col("_center"))
        & (F.col("sample_idx") == F.col("_idx")), "left")
    return j.select(
        "series_id", "channel", "sample_idx", v,
        F.coalesce("n_neighbors", F.lit(0)).alias("n_neighbors"),
        (v - F.col("_nbr_mean")).alias("csd"))
