"""Registry entries exercising the UDF surface (functions/udfs.py) with
DuckDB oracles — the Arrow-vectorized results are deterministic numpy math,
so they hash-match plain SQL reformulations."""
from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.udfs import covar_pop_udaf, l2_norm, py_bucket_fallback
from .core import T, query, spread


@query(
    "udf_embed_norms",
    """
    SELECT vec_id, label,
           ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm
    FROM embeddings
    """,
    doc="scalar pandas_udf (Arrow-batched numpy L2 norm per vector) vs the "
        "pure-SQL higher-order-function formulation — the two sanctioned "
        "tiers of the same computation",
)
def udf_embed_norms(spark, sf_dir):
    e = spread(T(spark, sf_dir, "embeddings"))
    return e.select(
        "vec_id", "label",
        F.round(l2_norm(F.col("embedding").cast("array<double>")), 6)
        .alias("norm"))


@query(
    "udf_grouped_covar",
    """
    SELECT label,
           ROUND(COVAR_POP(CAST(embedding[1] AS DOUBLE),
                           CAST(embedding[2] AS DOUBLE)), 6) AS covar_d0_d1
    FROM embeddings
    GROUP BY label
    """,
    doc="grouped-aggregate pandas_udf (whole group -> one scalar, numpy "
        "covariance of embedding dims 0 and 1 per label) vs SQL COVAR_POP",
)
def udf_grouped_covar(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings")
    d0 = F.element_at("embedding", 1).cast("double")
    d1 = F.element_at("embedding", 2).cast("double")
    return (e.select("label", d0.alias("d0"), d1.alias("d1"))
            .groupBy("label")
            .agg(F.round(covar_pop_udaf("d0", "d1"), 6).alias("covar_d0_d1")))


@query(
    "udf_grouped_map_demean",
    """
    WITH flat AS (
      SELECT vec_id, label,
             UNNEST(RANGE(1, LEN(embedding) + 1)) AS dim,
             CAST(UNNEST(embedding) AS DOUBLE) AS x
      FROM embeddings
    )
    SELECT vec_id, label, dim,
           ROUND(x - AVG(x) OVER (PARTITION BY label, dim), 6) AS centered
    FROM flat
    WHERE dim <= 4
    """,
    doc="grouped-map applyInPandas (the spectral-kernel carrier, §2C UDF "
        "surface) under the oracle gate: per-label batch demeaning of the "
        "first 4 embedding dims in numpy — the whole group arrives as one "
        "pandas frame, exactly like the DSP kernels receive a channel",
)
def udf_grouped_map_demean(spark, sf_dir):
    import numpy as np
    import pandas as pd

    e = T(spark, sf_dir, "embeddings")

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        M = np.stack(pdf["embedding"].to_numpy())[:, :4].astype(np.float64)
        C = M - M.mean(axis=0, keepdims=True)
        n, d = C.shape
        return pd.DataFrame({
            "vec_id": np.repeat(pdf["vec_id"].to_numpy(), d),
            "label": np.repeat(pdf["label"].to_numpy(), d),
            "dim": np.tile(np.arange(1, d + 1, dtype=np.int64), n),
            "centered": np.round(C.ravel(), 6),
        })

    return e.groupBy("label").applyInPandas(
        demean, "vec_id BIGINT, label INT, dim BIGINT, centered DOUBLE")


@query(
    "udf_python_fallback",
    """
    SELECT CASE WHEN n_chars < 200 THEN 'short'
                WHEN n_chars < 1000 THEN 'medium'
                ELSE 'long' END AS bucket,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY 1
    """,
    doc="row-at-a-time python udf fallback (deliberately the slow tier, "
        "kept off hot paths) vs the CASE expression every hot path should "
        "use instead",
)
def udf_python_fallback(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return (d.select(py_bucket_fallback(F.col("n_chars").cast("int"))
                     .alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("n_docs")))


@query(
    "udf_arrow_grouped_scale",
    """
    WITH flat AS (
      SELECT vec_id, label,
             UNNEST(RANGE(1, LEN(embedding) + 1)) AS dim,
             CAST(UNNEST(embedding) AS DOUBLE) AS x
      FROM embeddings
    )
    SELECT vec_id, label, dim,
           ROUND((x - MIN(x) OVER (PARTITION BY label, dim))
                 / (MAX(x) OVER (PARTITION BY label, dim)
                    - MIN(x) OVER (PARTITION BY label, dim)), 6) AS scaled
    FROM flat
    WHERE dim <= 3
    """,
    doc="grouped-map applyInArrow (Spark 4's zero-pandas Arrow path): "
        "per-label min-max scaling of the first 3 embedding dims computed "
        "straight from pyarrow buffers into numpy — no pandas "
        "materialization, so the JVM<->Python hop is one Arrow batch each "
        "way. Same carrier shape as applyInPandas but cheaper per batch",
)
def udf_arrow_grouped_scale(spark, sf_dir):
    import numpy as np
    import pyarrow as pa

    e = T(spark, sf_dir, "embeddings")

    def scale(table: "pa.Table") -> "pa.Table":
        M = np.stack(table["embedding"].to_numpy(zero_copy_only=False))
        M = M[:, :3].astype(np.float64)
        lo, hi = M.min(axis=0, keepdims=True), M.max(axis=0, keepdims=True)
        S = np.round((M - lo) / (hi - lo), 6)
        n, d = S.shape
        return pa.table({
            "vec_id": np.repeat(table["vec_id"].to_numpy(), d),
            "label": np.repeat(table["label"].to_numpy(), d),
            "dim": np.tile(np.arange(1, d + 1, dtype=np.int64), n),
            "scaled": S.ravel(),
        })

    return e.groupBy("label").applyInArrow(
        scale, "vec_id BIGINT, label INT, dim BIGINT, scaled DOUBLE")


@query(
    "udtf_word_positions",
    """
    SELECT p_partkey,
           UNNEST(STRING_SPLIT(p_name, ' ')) AS word,
           CAST(UNNEST(RANGE(LEN(STRING_SPLIT(p_name, ' '))))
                AS INT) AS pos
    FROM part
    WHERE p_partkey % 4 = 0
    """,
    doc="Python UDTF (table function, Spark 3.5+): one input row fans out "
        "to one row per word with its position, consumed via LATERAL "
        "correlated table-function join. The UDTF runs Arrow-batched per "
        "partition (same worker path as other Python UDFs); for this "
        "splittable case the built-in posexplode(split()) is the "
        "cheaper JVM-only form — the entry exists to cover the UDTF API "
        "carrier for fan-outs that genuinely need Python. DuckDB oracle "
        "zips two equal-length UNNESTs row-wise",
)
def udtf_word_positions(spark, sf_dir):
    from pyspark.sql.functions import udtf

    # defined inside the query fn: @udtf return-type parsing and
    # registration need an active session (same constraint as DDL-string
    # pandas_udf types, see test_registry_imports_without_session)
    @udtf(returnType="word: string, pos: int")
    class WordPositions:
        def eval(self, name: str):
            for i, w in enumerate((name or "").split(" ")):
                yield w, i

    spark.udtf.register("word_positions", WordPositions)
    T(spark, sf_dir, "part").filter(F.col("p_partkey") % 4 == 0) \
        .createOrReplaceTempView("_udtf_part")
    return spark.sql("""
        SELECT p.p_partkey, s.word, s.pos
        FROM _udtf_part p, LATERAL word_positions(p.p_name) s
    """)


@query(
    "udf_arrow_map_stats",
    """
    SELECT vec_id,
           CAST(LEN(embedding) AS INT) AS dim,
           ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2
    FROM embeddings
    """,
    doc="mapInArrow (partition-level Arrow iterator, zero pandas): per "
        "vector, dimensionality and L2 norm computed straight off the "
        "ListArray's flat values+offsets buffers with numpy reduceat — "
        "no per-row materialization, no pandas conversion overhead. The "
        "lowest-level Python carrier in the UDF matrix (scalar "
        "pandas_udf < grouped pandas < applyInArrow < mapInArrow); "
        "rounding happens JVM-side so the oracle's ROUND semantics apply",
)
def udf_arrow_map_stats(spark, sf_dir):
    def stats(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            emb = b.column(b.schema.get_field_index("embedding"))
            offs = np.asarray(emb.offsets)
            vals = np.asarray(emb.values, dtype=np.float64)
            sq = vals * vals
            # segment sums via prefix sums, NOT np.add.reduceat: reduceat
            # mishandles empty segments (offs[i] == offs[i+1] returns the
            # NEXT segment's first value; a trailing empty segment raises
            # index-out-of-bounds), and an ingest bug producing one empty
            # embedding would silently corrupt or kill the task
            cs = np.concatenate(([0.0], np.cumsum(sq)))
            l2 = np.sqrt(cs[offs[1:]] - cs[offs[:-1]])
            yield pa.RecordBatch.from_arrays(
                [b.column(b.schema.get_field_index("vec_id")),
                 pa.array(np.diff(offs).astype("int32"), pa.int32()),
                 pa.array(l2, pa.float64())],
                ["vec_id", "dim", "l2"])

    e = spread(T(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    out = e.mapInArrow(stats, "vec_id BIGINT, dim INT, l2 DOUBLE")
    return out.select("vec_id", "dim", F.round("l2", 6).alias("l2"))
