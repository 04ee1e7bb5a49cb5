"""Bench-time scaled/skewed data generators (process_nwb_spark/benchdata):
the scaling bench's ratios are only meaningful if the scaled data is
join-consistent, selectivity-preserving, and deterministic."""
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from process_nwb_spark.benchdata import (KEY_OFFSET, gen_scaled_dir,
                                         gen_skewed_events)

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled(spark):
    d = tempfile.mkdtemp(prefix="benchdata_scaled_")
    gen_scaled_dir(spark, SRC, 3, d)
    return d


def test_scaled_row_counts(spark, scaled):
    for t, grows in [("lineitem", True), ("orders", True),
                     ("documents", True), ("nation", False),
                     ("region", False)]:
        n_src = spark.read.parquet(f"{SRC}/{t}.parquet").count()
        n_out = spark.read.parquet(f"{scaled}/{t}.parquet").count()
        assert n_out == (3 * n_src if grows else n_src), t


def test_scaled_join_consistency(spark, scaled):
    """Every shifted foreign key must resolve inside its own copy, and
    copies must not cross-join (key ranges are disjoint blocks)."""
    li = spark.read.parquet(f"{scaled}/lineitem.parquet")
    o = spark.read.parquet(f"{scaled}/orders.parquet")
    c = spark.read.parquet(f"{scaled}/customer.parquet")
    assert li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").count() == 0
    assert o.join(c, o.o_custkey == c.c_custkey, "left_anti").count() == 0
    # a joined row's copy block must agree on both sides
    blocks = (li.join(o, li.l_orderkey == o.o_orderkey)
              .select((F.floor(li.l_orderkey / KEY_OFFSET)
                       != F.floor(o.o_orderkey / KEY_OFFSET)).alias("bad"))
              .filter("bad").count())
    assert blocks == 0


def test_scaled_documents_distinct_and_length_preserving(spark, scaled):
    d = spark.read.parquet(f"{scaled}/documents.parquet")
    n = d.count()
    # mutated copies must be genuinely distinct content (no cross-copy
    # near-dup blowup in the dedup benches)
    assert d.select("text").distinct().count() == n
    # translate preserves length, so the n_chars metadata stays true
    assert d.filter(F.length("text") != F.col("n_chars")).count() == 0


def test_scaled_embeddings_distinct(spark, scaled):
    e = spark.read.parquet(f"{scaled}/embeddings.parquet")
    assert e.select("embedding").distinct().count() == e.count()
    # perturbation is small: norms stay within 5% of the copy-0 block
    norms = e.select(
        (F.floor(F.col("vec_id") / KEY_OFFSET)).alias("blk"),
        F.sqrt(F.aggregate("embedding", F.lit(0.0),
                           lambda a, x: a + x * x)).alias("nrm"))
    stats = norms.groupBy("blk").agg(F.avg("nrm").alias("m")).collect()
    base = [r.m for r in stats if r.blk == 0][0]
    for r in stats:
        assert abs(r.m - base) / base < 0.05


def test_scaled_idempotent_marker(spark, scaled):
    """Second call must reuse, not rewrite (mtime unchanged)."""
    p = os.path.join(scaled, "lineitem.parquet")
    before = os.path.getmtime(p)
    gen_scaled_dir(spark, SRC, 3, scaled)
    assert os.path.getmtime(p) == before


def test_skewed_events_shape(spark):
    d = tempfile.mkdtemp(prefix="benchdata_skew_")
    gen_skewed_events(spark, d, n_rows=100_000, n_keys=2_000,
                      hot_share=0.35)
    f = spark.read.parquet(f"{d}/skew_facts.parquet")
    assert f.count() == 100_000
    top = (f.groupBy("key").count().orderBy(F.desc("count")).limit(2)
           .collect())
    assert top[0].key == 0
    share = top[0]["count"] / 100_000
    assert 0.33 < share < 0.37, share
    # the rest is near-uniform: second-hottest key far below the hot one
    assert top[1]["count"] < 0.01 * top[0]["count"]
    dims = spark.read.parquet(f"{d}/skew_dims.parquet")
    assert dims.count() == 2_000
    # every fact key resolves in dims
    assert f.join(dims, "key", "left_anti").count() == 0
