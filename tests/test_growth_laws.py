"""Growth-law pins for the sf1 bench-ratio edge faces (VERDICT r8 #3).

`BENCH_SCALING` measures TIME ratios, which mix real work with ambient
noise; these tests pin the BOUNDED QUANTITY each edge face's
scale-claim rests on, using the two committed testdata scales
(sf0.01 -> sf0.1, 10x rows), so superlinear drift is caught
structurally even when the timing window is noisy.

Expected growth laws (documented in SCALE.md §growth-laws):
- graph_triangles: work ~ oriented wedges Σ_src C(outdeg, 2); the
  degree-orientation caps outdeg at O(sqrt(|E|)) so wedges grow
  ~linearly with edges under the keyshift scale-up.
- agg_exact_median_selection: rounds = narrowing passes, a function of
  the VALUE SPAN (<= ceil(log_1024(span)) + 1), independent of rows.
- text_token_counts: a pure per-row projection — ZERO exchanges; cost
  is linear in characters by plan shape, there is nothing to measure.
"""
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.relational.core import T, all_queries

SF_A = "/root/testdata/sf0.01"
SF_B = "/root/testdata/sf0.1"


def _wedges(spark, sf_dir):
    """Oriented wedge count: the exact candidate-generation workload of
    graph_triangles (same edge construction, same low-degree-first
    orientation), reduced to one number by pure aggregation."""
    lines = (T(spark, sf_dir, "lineitem")
             .select(F.col("l_orderkey").alias("ok"),
                     F.col("l_partkey").alias("pk")).distinct())
    b = lines.select(F.col("ok").alias("ok2"), F.col("pk").alias("pk2"))
    edges = (lines.join(b, (F.col("ok") == F.col("ok2"))
                        & (F.col("pk") < F.col("pk2")))
             .select(F.col("pk").alias("u"), F.col("pk2").alias("v"))
             .distinct())
    deg = (edges.select(F.col("u").alias("node"))
           .unionAll(edges.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count("*").alias("d")))
    du = deg.select(F.col("node").alias("un"), F.col("d").alias("ud"))
    dv = deg.select(F.col("node").alias("vn"), F.col("d").alias("vd"))
    u_first = ((F.col("ud") < F.col("vd"))
               | ((F.col("ud") == F.col("vd")) & (F.col("u") < F.col("v"))))
    oriented = (edges.join(du, F.col("u") == F.col("un"))
                .join(dv, F.col("v") == F.col("vn"))
                .select(F.when(u_first, F.col("u")).otherwise(F.col("v"))
                        .alias("src")))
    row = (oriented.groupBy("src").agg(F.count("*").alias("od"))
           .agg(F.sum(F.expr("od * (od - 1) div 2")).alias("w"),
                F.count("*").alias("n_src")).first())
    n_edges = edges.count()
    return row["w"], n_edges


def test_triangle_wedges_grow_linearly_with_edges(spark):
    """Degree orientation bounds wedge growth: on 10x rows, wedges per
    edge must not blow up (a broken orientation makes wedges ~quadratic
    in the hot part's degree — that is exactly what this catches).
    Measured 2026-08: wedges/edge 33.4 (sf0.01) vs 34.4 (sf0.1) —
    per-edge wedge load is FLAT under 10x rows (ratio 1.03); the 4x
    headroom separates fixture drift from quadratic blowup, where the
    per-edge load itself would scale with the hot degree."""
    w_a, e_a = _wedges(spark, SF_A)
    w_b, e_b = _wedges(spark, SF_B)
    assert w_a > 0 and w_b > 0
    ratio_per_edge = (w_b / e_b) / (w_a / e_a)
    assert ratio_per_edge < 4.0, (w_a, e_a, w_b, e_b)


def test_exact_median_rounds_are_span_bounded_not_row_bounded(spark):
    import math

    from process_nwb_spark.relational import tpch_core

    rounds = {}
    for sf in (SF_A, SF_B):
        all_queries()["agg_exact_median_selection"].fn(spark, sf).collect()
        o = T(spark, sf, "orders").select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"))
        span = o.agg((F.max("c") - F.min("c") + 1).alias("s")).first()["s"]
        bound = math.ceil(math.log(max(span, 2), 1024)) + 1
        rounds[sf] = tpch_core._MEDIAN_ROUNDS_LAST
        assert 0 <= tpch_core._MEDIAN_ROUNDS_LAST <= bound, (
            sf, tpch_core._MEDIAN_ROUNDS_LAST, span, bound)
    # 10x rows must not add rounds beyond the span bound's growth
    assert rounds[SF_B] <= rounds[SF_A] + 1, rounds


def test_token_counts_plan_is_shuffle_free(spark):
    df = all_queries()["text_token_counts"].fn(spark, SF_A)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def _bucket_cells(keyed):
    """Per-(group, md5-prefix-bucket) row counts — the reducer workloads
    bucketed_hash_rank actually schedules."""
    return (keyed.withColumn("_b", F.substring("h", 1, 2))
            .groupBy("g", "_b").count()
            .groupBy("g").agg(F.max("count").alias("mx"),
                              F.sum("count").alias("n"))
            .collect())


def _mix_inputs(spark, sf_dir):
    """The two keyed frames the mix faces hand bucketed_hash_rank:
    languages (one language owns ~40% of the corpus) and epochs."""
    from process_nwb_spark.relational.dataprep import _EPOCHS

    d = T(spark, sf_dir, "documents")
    lang = d.select(F.col("lang").alias("g"),
                    F.md5(F.col("doc_id").cast("string")).alias("h"))
    epochs = spark.range(_EPOCHS).select(F.col("id").alias("epoch"))
    ep = (d.crossJoin(F.broadcast(epochs))
          .select(F.col("epoch").cast("string").alias("g"),
                  F.md5(F.concat(F.col("epoch").cast("string"),
                                 F.lit(":"),
                                 F.col("doc_id").cast("string")))
                  .alias("h")))
    return {"lang": lang, "epoch": ep}


def test_bucketed_hash_rank_buckets_stay_uniform(spark):
    """Pin the assumption BOTH mix faces' 100 TB story rests on: the
    md5-prefix 256-way buckets are uniform BY CONSTRUCTION, so no
    (group, bucket) reducer is a straggler even when one group owns
    half the corpus. Two pins per use site (languages / epochs):

    1. CONCENTRATION at both SFs: every group's hottest bucket stays
       within the binomial tail bound m + 4*sqrt(m*ln 256) + 3 around
       its own mean m = n_g/256 — the quantitative form of 'uniform by
       construction'. A seeded or prefix-biased key (e.g. hashing a
       value that shares a prefix across rows) blows straight past it.
    2. CONVERGENCE on 10x rows: the largest group's normalized skew
       (hottest bucket / mean) must not grow from sf0.01 to sf0.1 —
       relative fluctuations shrink as n grows, so at 100 TB the
       buckets are flat; a skew that GROWS with n is exactly the
       straggler signature this helper exists to rule out.
    """
    import math

    ln256 = math.log(256)
    for name in ("lang", "epoch"):
        skew_largest = {}
        for sf in (SF_A, SF_B):
            rows = _bucket_cells(_mix_inputs(spark, sf)[name])
            for r in rows:
                m = r["n"] / 256.0
                bound = m + 4 * math.sqrt(max(m, 1.0) * ln256) + 3
                assert r["mx"] <= bound, (
                    f"{name}@{sf} group {r['g']}: hottest bucket "
                    f"{r['mx']} exceeds concentration bound {bound:.1f} "
                    f"(n={r['n']})")
            big = max(rows, key=lambda r: r["n"])
            skew_largest[sf] = big["mx"] / (big["n"] / 256.0)
        assert skew_largest[SF_B] <= skew_largest[SF_A], (
            f"{name}: normalized bucket skew GREW on 10x rows "
            f"({skew_largest[SF_A]:.2f} -> {skew_largest[SF_B]:.2f}) — "
            f"straggler signature")


def _range_bucket_cells(spark, sf_dir):
    """The (source, score-grid bucket) cell sizes bucketed_range_rank
    actually schedules for the ranked mix faces (token budget /
    curriculum / the score half of anneal): same integer score key,
    same fixed 40-bucket grid over [0, 10000]."""
    from process_nwb_spark.relational.dataprep import range_rank_step

    d = T(spark, sf_dir, "documents")
    # the SAME step the helper schedules (mix_token_budget's call:
    # key_max=10000, n_buckets=40) — derived, not duplicated, so a
    # tuned grid formula retunes this pin automatically
    step = range_rank_step(10000, 40)
    scored = d.select(
        F.col("source").alias("g"),
        F.expr("CAST((CAST(size(array_distinct(regexp_extract_all("
               "lower(text), '\\\\w+', 0))) AS BIGINT) * 10000) DIV "
               "GREATEST(CAST(regexp_count(text, '\\\\w+') AS BIGINT), 1) "
               "AS BIGINT)").alias("k"))
    return (scored.withColumn("_b", F.expr(f"k DIV {step}"))
            .groupBy("g", "_b").count()
            .groupBy("g").agg(F.max("count").alias("mx"),
                              F.sum("count").alias("n"))
            .collect())


def test_bucketed_range_rank_grid_bounds_per_task_sort(spark):
    """Pin the weaker-but-sufficient claim the RANGE-grid helper makes
    (its docstring says so explicitly): unlike the md5 prefix, the
    fixed score grid is NOT uniform by construction — real score
    distributions cluster — but a skewed bucket still bounds the
    per-task sort at a modest fraction of its group instead of ALL of
    it. Two pins:

    1. at both SFs, every source's hottest grid bucket holds < 45% of
       the source (the single-task window it replaces holds 100%;
       the fixture's diversity scores concentrate around ~25-35% in
       the modal bucket);
    2. the largest source's hottest-bucket SHARE must not grow on 10x
       rows — the distribution is a property of the scoring function,
       not of corpus size, so concentration growing with n would mean
       the grid stops helping exactly when it matters."""
    share_largest = {}
    for sf in (SF_A, SF_B):
        rows = _range_bucket_cells(spark, sf)
        for r in rows:
            share = r["mx"] / r["n"]
            assert share < 0.45, (
                f"{sf} source {r['g']}: hottest score-grid bucket holds "
                f"{share:.1%} of the source (n={r['n']})")
        big = max(rows, key=lambda r: r["n"])
        share_largest[sf] = big["mx"] / big["n"]
    assert share_largest[SF_B] <= share_largest[SF_A] + 0.02, (
        f"hottest-bucket share grew on 10x rows "
        f"({share_largest[SF_A]:.2%} -> {share_largest[SF_B]:.2%})")
