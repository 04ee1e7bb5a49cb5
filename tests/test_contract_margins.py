"""Margin assertions for the contract-boolean driver faces first sampled
in round 7 (sig_band_power, sig_line_noise_snr, sig_spectral_features).

A contract face emits booleans like `snr > 3.0`; if the measured
statistic sat NEAR its threshold, an innocuous cross-session float
difference (partitioning, libm) could flip the boolean at the driver —
the same knife-edge class as ROUND-boundary hash flips. These tests pin
each underlying STATISTIC at >=2x slack from its face threshold, so the
face booleans cannot flip without a real regression. Measured values
(2026-08, local[32]): flat dev <=0.003 (thr 0.05), alpha 0.860 (thr
0.6), far-band <=0.005 (thr 0.05), clean snr 1.007 (window 0.5..2),
noisy snr 5.12 (thr 3), post-notch 0.80/0.84 (thr 2), entropy
0.9992/0.158 (thr 0.9/0.35), SEF 474.6/50.8 (windows 460..490/45..56).
"""
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.relational.signal_queries import (_hash_uniform,
                                                         _synth_long)

RATE, N_T = 1000.0, 32768
PI2 = 2 * 3.141592653589793


def test_band_power_face_margins(spark):
    from process_nwb_spark.operators.spectral_summary import band_power

    def value_fn(ch, idx):
        t = idx.cast("double") / RATE
        tone = F.lit(2.0 ** 0.5) * F.sin(F.lit(PI2 * 10.0) * t)
        return F.when(ch == 1, tone + 0.3 * _hash_uniform(idx, ch)) \
            .otherwise(_hash_uniform(idx, ch))

    bp = band_power(_synth_long(spark, 2, N_T, value_fn),
                    RATE, 512, relative=True).collect()
    for r in bp:
        share = (r.hi_hz - r.lo_hz) / (RATE / 2.0)
        if r.channel == 0:
            # face threshold: dev < 0.05 -> require half of it
            assert abs(r.rel_power - share) < 0.025, (r.band_name,
                                                      r.rel_power, share)
        elif r.band_name == "alpha":
            # face threshold: > 0.6 -> require 0.75
            assert r.rel_power > 0.75, r.rel_power
        elif r.band_name in ("delta", "beta", "gamma"):
            # face threshold: < 0.05 -> require half of it
            assert r.rel_power < 0.025, (r.band_name, r.rel_power)


def test_line_noise_snr_face_margins(spark):
    from process_nwb_spark.operators.segmented import segmented_notch
    from process_nwb_spark.operators.spectral_summary import line_noise_snr

    def value_fn(ch, idx):
        t = idx.cast("double") / RATE
        line = F.lit(0.5) * F.sin(F.lit(PI2 * 60.0) * t)
        return F.when(ch == 1, line + _hash_uniform(idx, ch)) \
            .otherwise(_hash_uniform(idx, ch))

    sig = _synth_long(spark, 2, N_T, value_fn)
    before = {r.channel: r.snr
              for r in line_noise_snr(sig, RATE, 512).collect()}
    notched = segmented_notch(sig, RATE, seg_len=4096, overlap=512)
    after = {r.channel: r.snr
             for r in line_noise_snr(notched, RATE, 512).collect()}
    # face window 0.5..2.0 -> require the inner half 0.75..1.35
    assert 0.75 < before[0] < 1.35, before[0]
    # face threshold > 3.0 -> require 4.5 (1.5x; measured 5.12)
    assert before[1] > 4.5, before[1]
    # face threshold < 2.0 -> require 1.2 on both channels
    assert after[0] < 1.2 and after[1] < 1.2, after


# ---------------------------------------------------------------------------
# r7 contract faces (first driver sampling expected in r8): pin each face's
# contract statistic at >=2x slack from its threshold, so the face booleans
# / rank cuts cannot flip at the driver without a real regression. Measured
# (2026-08, sf0.01, local[8]): theta rel_err 0.0 exact-mode / 0.48%-0.9%
# estimating-mode (thr 5%), minhash mean abs_err 0.045 max 0.242 (k=8,
# sd ~0.17), quality buckets {0:(395,180), 1:(100,33), 2:(5,5)},
# matryoshka min midpoint distance 1.1e-11 (flip window ~1e-16).
# ---------------------------------------------------------------------------

from tests.conftest import SF_CORRECT  # noqa: E402


def test_theta_set_ops_face_margins(spark):
    """The face's union_ok/intersect_ok booleans assert <=5% error. At
    sf0.01 both sketches hold < 2^lgK entries, so Theta is in EXACT mode
    and the slack is infinite — assert exactly that, so a fixture growth
    that pushes the sketch into estimation mode is caught here before
    the driver sees it. A synthetic 350k-cardinality probe then pins the
    estimating-mode error at <=2.5% (half the face threshold)."""
    e = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
    sk = (e.filter(F.col("event_type").isin("click", "purchase"))
          .groupBy("event_type")
          .agg(F.expr("theta_sketch_agg(user_id, 12)").alias("sk")))
    w = sk.agg(
        F.max(F.when(F.col("event_type") == "click", F.col("sk")))
        .alias("sk_c"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("sk")))
        .alias("sk_p"))
    got = w.select(
        F.expr("theta_sketch_estimate(theta_union(sk_c, sk_p))").alias("u"),
        F.expr("theta_sketch_estimate(theta_intersection(sk_c, sk_p))")
        .alias("i")).first()
    c = e.filter(F.col("event_type") == "click").select("user_id").distinct()
    p = (e.filter(F.col("event_type") == "purchase")
         .select("user_id").distinct())
    ex_u = c.union(p).distinct().count()
    ex_i = c.join(p, "user_id").count()
    # exact mode: zero error, not merely <=5%
    assert got.u == ex_u and got.i == ex_i, (got, ex_u, ex_i)

    # estimating mode: two 200k/250k ranges overlapping in 100k ids
    a = spark.range(0, 200_000).select(F.col("id").alias("uid"),
                                       F.lit("a").alias("g"))
    b = spark.range(100_000, 350_000).select(F.col("id").alias("uid"),
                                             F.lit("b").alias("g"))
    sk2 = (a.union(b).groupBy("g")
           .agg(F.expr("theta_sketch_agg(uid, 12)").alias("sk")))
    w2 = sk2.agg(F.max(F.when(F.col("g") == "a", F.col("sk"))).alias("ska"),
                 F.max(F.when(F.col("g") == "b", F.col("sk"))).alias("skb"))
    r = w2.select(
        F.expr("theta_sketch_estimate(theta_union(ska, skb))").alias("u"),
        F.expr("theta_sketch_estimate(theta_intersection(ska, skb))")
        .alias("i")).first()
    # face threshold 5% -> require 2.5% (measured 0.48% / 0.9%)
    assert abs(r.u - 350_000) / 350_000 <= 0.025, r.u
    assert abs(r.i - 100_000) / 100_000 <= 0.025, r.i


def test_minhash_jaccard_est_face_margins(spark):
    """The face publishes the k=8 estimator's calibration; its documented
    contract is error ~ 1/sqrt(k) (~0.35 sd). Pin the measured errors at
    >=2x slack (mean 0.045 -> allow 0.15; max 0.242 -> allow 0.45) and
    the estimate's integer domain, so a signature or banding regression
    can't silently degrade the estimator the dedup pipeline trusts."""
    from process_nwb_spark.relational.core import all_queries

    pdf = (all_queries()["minhash_jaccard_est"].fn(spark, SF_CORRECT)
           .toPandas())
    assert len(pdf) > 0
    assert pdf["n_match"].between(0, 8).all()
    assert ((pdf["j_est"] * 8).round() == pdf["j_est"] * 8).all()
    assert pdf["abs_err"].mean() <= 0.15, pdf["abs_err"].mean()
    assert pdf["abs_err"].max() <= 0.45, pdf["abs_err"].max()


def test_quality_calibration_face_margins(spark):
    """Bucket membership is integer arithmetic ((s_en*20) div n_tok,
    capped) — assert the whole sf0.01 reliability table EXACTLY, pinning
    that n_pos/n_docs are integers whose ratio reproduces pos_rate
    bit-for-bit (pos_rate is one float division of exact ints in both
    engines). Any float-boundary bucket flip or fixture drift lands
    here before the driver."""
    from process_nwb_spark.relational.core import all_queries

    rows = {r.bucket: r for r in all_queries()["quality_calibration"]
            .fn(spark, SF_CORRECT).collect()}
    assert {b: (r.n_docs, r.n_pos) for b, r in rows.items()} == {
        0: (395, 180), 1: (100, 33), 2: (5, 5)}
    for r in rows.values():
        assert r.pos_rate == r.n_pos / r.n_docs   # exact double division


def test_matryoshka_rounding_margin(spark):
    """The face ranks by ROUND(cosine, 6) with vec_id tie-break; a driver
    flip would need an unrounded cosine to sit within the cross-engine
    fold-difference window (~1e-16; the fold is libm-free multiply-add
    in pinned order) of a 0.5e-6 rounding midpoint. Assert every
    anchor-candidate cosine — full AND 16-dim truncated — keeps >=5e-12
    distance from the nearest midpoint (measured minimum 1.1e-11): four
    orders of magnitude of slack."""
    import numpy as np

    pdf = (spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
           .select("vec_id", "embedding").toPandas())
    V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()

    def min_middist(X, q):
        cos = X @ q / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
        scaled = cos * 1e6 - 0.5
        return float(np.min(np.abs(scaled - np.round(scaled)))) * 1e-6

    worst = 1.0
    for aid in ids[ids % 50 == 0]:
        ai = int(np.where(ids == aid)[0][0])
        mask = ids != aid
        worst = min(worst, min_middist(V[mask], V[ai]),
                    min_middist(V[mask][:, :16], V[ai][:16]))
    assert worst >= 5e-12, worst


def test_spectral_features_face_margins(spark):
    from process_nwb_spark.operators.features import (spectral_edge,
                                                      spectral_entropy)

    def value_fn(ch, idx):
        t = idx.cast("double") / RATE
        tone = F.lit(2.0 ** 0.5) * F.sin(F.lit(PI2 * 50.0) * t)
        return F.when(ch == 1, tone + 0.05 * _hash_uniform(idx, ch)) \
            .otherwise(_hash_uniform(idx, ch))

    sig = _synth_long(spark, 2, N_T, value_fn)
    ent = {r.channel: r.entropy
           for r in spectral_entropy(sig, RATE, 512).collect()}
    sef = {r.channel: r.sef_hz
           for r in spectral_edge(sig, RATE, 512).collect()}
    # face thresholds > 0.9 / < 0.35 -> require 0.95 / 0.25
    assert ent[0] > 0.95 and ent[1] < 0.25, ent
    # face windows 460..490 / 45..56 -> require the inner halves
    assert 467.0 < sef[0] < 483.0, sef[0]
    assert 47.0 < sef[1] < 54.0, sef[1]


def test_cms_overcount_margin(spark):
    """agg_count_min_sketch emits bound_ok := (est-exact)*W <= 4N.
    Measured (2026-08, sf0.01, local[32]): worst overcount 0 vs bound
    ~424 — the top-10 tokens dominate their own buckets. Pin >=2x slack:
    worst overcount must stay under HALF the face bound so cross-session
    noise cannot flip the boolean at the driver."""
    from process_nwb_spark.relational.core import T, all_queries
    from process_nwb_spark.relational.llm_ops import _CMS_W

    sf = "/root/testdata/sf0.01"
    rows = all_queries()["agg_count_min_sketch"].fn(spark, sf).collect()
    assert rows and all(r.over_ok and r.bound_ok for r in rows)
    n_tok = (T(spark, sf, "documents")
             .select(F.explode(F.split("text", " ")))
             .count())
    worst = max(r.est_cnt - r.exact_cnt for r in rows)
    assert worst <= (4 * n_tok / _CMS_W) / 2, (worst, n_tok)


def test_freshness_sla_margin(spark):
    """dq_freshness_lag emits fresh_24h := lag <= 24 h. If any stream's
    lag sat NEAR 24 h, a fixture regeneration or timezone slip could
    flip the boolean at the driver. Require >=2x slack on BOTH sides:
    every fresh stream under 12 h behind, every stale one over 48 h."""
    from process_nwb_spark.relational.core import all_queries

    rows = all_queries()["dq_freshness_lag"].fn(
        spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        if r.fresh_24h:
            assert r.hours_behind < 12, (r.event_type, r.hours_behind)
        else:
            assert r.hours_behind > 48, (r.event_type, r.hours_behind)


def test_join_cardinality_exact_under_skew(spark):
    """dq_join_cardinality emits exact_match := Σ ca·cb == |A ⋈ B|.
    The identity must hold under a skewed key (the exact case where a
    sampling-based estimator would be off): one hot key carrying 35% of
    fact rows against a dim key repeated 7x. Built from scratch so the
    margin doesn't depend on the TPC-H generator's key spread."""
    a = spark.range(0, 10_000).selectExpr(
        "CASE WHEN id % 100 < 35 THEN 0 ELSE id END AS k")
    b = (spark.range(0, 200).selectExpr("id AS k")
         .unionAll(spark.range(0, 7).selectExpr("0 AS k")))
    ca = a.groupBy("k").agg(F.count("*").alias("ca"))
    cb = b.groupBy("k").agg(F.count("*").alias("cb"))
    est = (ca.join(cb, "k")
           .agg(F.sum(F.col("ca") * F.col("cb"))).first()[0])
    actual = a.join(b, "k").count()
    # hot key alone contributes 3500*7 = 24500 of the output
    assert actual > 24_000
    assert est == actual
    # and the shipped face's boolean on the fixture data
    from process_nwb_spark.relational.core import all_queries
    row = all_queries()["dq_join_cardinality"].fn(
        spark, "/root/testdata/sf0.01").first()
    assert row.exact_match and row.est_rows == row.actual_rows


def test_lttb_exact_tie_resolution(spark, tmp_path):
    """ts_lttb_downsample scores candidates with exact |bigint| areas,
    ties -> smallest index. The knife-edge is an EXACT tie: craft one
    series where every area is 0 (constant y — every candidate tied)
    and one where y oscillates symmetrically (two-way ties inside
    buckets), write them as an events table, and assert the Spark face
    equals the DuckDB oracle row-for-row. Float-area implementations
    diverge here (which candidate wins depends on rounding); the
    cross-multiplied integer form cannot."""
    import datetime

    import duckdb
    import pandas as pd

    from process_nwb_spark.relational.core import all_queries

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for day in range(40):
        ts = base + datetime.timedelta(days=day)
        for _ in range(5):                       # constant series: all ties
            rows.append(("flat", ts))
        for _ in range(3 + (day % 2)):           # symmetric oscillation
            rows.append(("osc", ts))
    pdf = pd.DataFrame(rows, columns=["event_type", "ts"])
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{sf_dir}/events.parquet")

    spec = all_queries()["ts_lttb_downsample"]
    got = (spec.fn(spark, sf_dir).toPandas()
           .sort_values(["event_type", "pick_no"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet/*.parquet')")
    want = (con.execute(spec.oracle).df()
            .sort_values(["event_type", "pick_no"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)
    # the tie rule itself: constant series must pick each bucket's FIRST
    # candidate — with m=40, s(j) = 1 + (j*38) div 10
    flat = got[got.event_type == "flat"]
    m, nb = 40, 10
    first_cands = [1 + (j * (m - 2)) // nb for j in range(nb)]
    picked_days = list(flat.d)[1:-1]
    want_days = [(base + datetime.timedelta(days=i)).strftime("%Y-%m-%d")
                 for i in first_cands]
    assert picked_days == want_days
