"""Round-9 face pins: WCC star-contraction convergence margin and URL
canonicalization invariants."""
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.relational.core import all_queries

SF = "/root/testdata/sf0.01"


def test_wcc_star_converges_with_margin(spark, monkeypatch):
    """graph_wcc_star runs 8 bounded alternating rounds and its oracle
    is the ground-truth fixpoint — so the gate only stays green while
    the rounds suffice. Pin the margin: the fixture must already be
    converged at 5 rounds (3 spare), and 8 rounds must change nothing
    (a fixed point, as star contraction guarantees)."""
    from process_nwb_spark.relational import graph_ops

    spec = all_queries()["graph_wcc_star"]

    def run(rounds):
        monkeypatch.setattr(graph_ops, "_WCC_ROUNDS", rounds)
        return (spec.fn(spark, SF).toPandas()
                .sort_values("node").reset_index(drop=True))

    r5, r8 = run(5), run(8)
    assert r5.equals(r8), "not converged by round 5 — margin eroded"
    assert r8.component.nunique() > 50          # many components
    assert int(r8.component_size.max()) > 50    # with multi-hop structure


def test_wcc_star_round_growth_law_sf01(spark, monkeypatch):
    """GROWTH-LAW pin (r10): _WCC_ROUNDS=8 is calibrated on the sf0.01
    fixture; star contraction's round count grows as log(n), so the
    pin must hold where n is 10x bigger or the budget is fiction. At
    sf0.1 (16,666 nodes vs 1,677) the graph must still be a fixed
    point by round 5 — measured: round 4 differs, rounds 5 and 8 agree
    — keeping the same 3-round margin the sf0.01 pin asserts. If graph
    shape ever drifts this past round 5, the 8-round budget is the
    first thing to re-derive (the wedge pin protects graph_triangles
    the same way)."""
    from process_nwb_spark.relational import graph_ops

    spec = all_queries()["graph_wcc_star"]

    def agg(rounds):
        monkeypatch.setattr(graph_ops, "_WCC_ROUNDS", rounds)
        df = spec.fn(spark, "/root/testdata/sf0.1")
        return tuple(df.agg(
            F.count("*"),
            F.sum(F.xxhash64("node", "component",
                             "component_size"))).first())

    r5, r8 = agg(5), agg(8)
    assert r5 == r8, "sf0.1 not converged by round 5 — margin eroded"
    assert r5[0] == 16666


def test_wcc_star_components_are_self_consistent(spark):
    """Component labels must be the component MIN and sizes must add up
    — internal consistency independent of the oracle."""
    pdf = all_queries()["graph_wcc_star"].fn(spark, SF).toPandas()
    grp = pdf.groupby("component")
    assert (grp["node"].min() == grp["node"].first().index).all()
    sizes = grp.size()
    assert all(pdf.component_size == pdf.component.map(sizes))


def test_url_canonicalize_collapses_all_variants(spark):
    pdf = all_queries()["fn_url_canonicalize"].fn(spark, SF).toPandas()
    assert len(pdf) > 0
    # one canonical per doc — every messy variant collapsed
    assert pdf.doc_id.is_unique
    even = pdf[pdf.doc_id % 2 == 0]
    odd = pdf[pdf.doc_id % 2 == 1]
    assert (even.n_variants == 3).all() and (odd.n_variants == 2).all()
    # canonical form: lowercase, no port, no utm, no fragment, no
    # trailing slash, params sorted
    for u in pdf.canonical_url:
        assert u == u.lower() and ":443" not in u and "utm_" not in u
        assert "#" not in u and "/?" not in u
        q = u.split("?", 1)[1].split("&")
        assert q == sorted(q)


def test_psi_zero_on_identical_periods_and_positive_on_shift(spark,
                                                             tmp_path):
    """PSI is a sum of (pc-pb)·ln(pc/pb) terms, each >= 0; identical
    period distributions must give EXACTLY 0.0 (equal smoothed
    proportions per bucket), and a location shift must clear the 0.25
    'significant drift' alerting bar with margin."""
    import datetime

    import pandas as pd

    rows = []
    base_day = datetime.datetime(2024, 1, 2)
    cur_day = datetime.datetime(2024, 1, 20)
    for i in range(500):
        v = float(1 + (i % 100))
        rows.append((i, base_day, 1, "same", v, "{}"))
        rows.append((10_000 + i, cur_day, 1, "same", v, "{}"))
        rows.append((20_000 + i, base_day, 1, "shifted", v, "{}"))
        rows.append((30_000 + i, cur_day, 1, "shifted", v + 60.0, "{}"))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{sf_dir}/events.parquet")

    got = (all_queries()["dq_psi_drift"].fn(spark, sf_dir).toPandas()
           .set_index("event_type"))
    assert got.loc["same", "psi"] == 0.0
    assert got.loc["shifted", "psi"] > 0.5          # 2x the 0.25 alert bar
    assert (got.n_base == 500).all() and (got.n_cur == 500).all()


def test_psi_nonnegative_on_fixture(spark):
    pdf = all_queries()["dq_psi_drift"].fn(spark, SF).toPandas()
    assert len(pdf) > 0
    assert (pdf.psi >= 0).all()


def test_epoch_shuffle_is_distinct_permutations(spark):
    pdf = all_queries()["mix_epoch_shuffle"].fn(spark, SF).toPandas()
    n_docs = pdf.doc_id.nunique()
    orders = {}
    for ep, grp in pdf.groupby("epoch"):
        grp = grp.sort_values("position")
        # positions are a dense 1..n permutation of the whole corpus
        assert list(grp.position) == list(range(1, n_docs + 1))
        assert grp.doc_id.is_unique and len(grp) == n_docs
        orders[ep] = tuple(grp.doc_id)
    # every epoch is a DIFFERENT permutation...
    assert len(set(orders.values())) == len(orders) == 3
    # ...and none of them is the identity order
    ident = tuple(sorted(orders[0]))
    assert all(o != ident for o in orders.values())
    # determinism: recompute equals first run
    again = (all_queries()["mix_epoch_shuffle"].fn(spark, SF).toPandas()
             .sort_values(["epoch", "position"]).reset_index(drop=True))
    first = pdf.sort_values(["epoch", "position"]).reset_index(drop=True)
    assert first.equals(again)


def test_seasonal_strength_bounds_and_replay(spark):
    """F_T / F_S land in [0,1] by construction (max(0, 1 - ratio) of
    nonnegative variances), and a numpy replay of the variance ratios
    from the same hourly rollup must agree to float tolerance (the
    exact-gate proves bitwise vs DuckDB; this replays the MATH)."""
    import numpy as np
    import pandas as pd

    row = all_queries()["ts_seasonal_strength"].fn(spark, SF).first()
    assert 0.0 <= row.f_trend <= 1.0 and 0.0 <= row.f_seasonal <= 1.0
    assert row.n_hours > 24 * 7          # the fixture spans weeks

    ev = pd.read_parquet(f"{SF}/events.parquet")
    cents = np.round(ev.value.astype(float) * 100).astype("int64")
    hourly = (pd.DataFrame({"h": ev.ts.dt.floor("h"), "c": cents})
              .groupby("h")["c"].sum().sort_index() / 100.0)
    v = hourly.to_numpy()
    n = len(v)
    assert n == row.n_hours
    trend = np.array([v[max(0, i - 12): i + 13].mean() for i in range(n)])
    hod = hourly.index.hour.to_numpy()
    dev = v - trend
    s = np.array([dev[hod == k].mean() for k in range(24)])[hod]
    r = v - trend - s
    f_t = max(0.0, 1.0 - r.var() / (v - s).var())
    f_s = max(0.0, 1.0 - r.var() / dev.var())
    assert abs(row.f_trend - f_t) < 1e-6
    assert abs(row.f_seasonal - f_s) < 1e-6


def test_leakage_safe_split_no_straddling_pairs(spark):
    """The structural claim: NO near-dup candidate pair may straddle the
    split. Join the LSH pair list against the assignment and assert both
    sides always agree; also sanity the split fraction near 13/16."""
    from process_nwb_spark.relational.llm_ops import minhash_lsh_candidates

    asg = all_queries()["split_leakage_safe"].fn(spark, SF)
    pairs = minhash_lsh_candidates(spark, SF)
    a = asg.select(F.col("doc_id").alias("doc_a"),
                   F.col("split").alias("split_a"))
    b = asg.select(F.col("doc_id").alias("doc_b"),
                   F.col("split").alias("split_b"))
    joined = pairs.join(a, "doc_a").join(b, "doc_b")
    n_pairs = joined.count()
    assert n_pairs > 0                       # the fixture has candidates
    assert joined.filter("split_a <> split_b").count() == 0
    frac = (asg.filter("split = 'train'").count() / asg.count())
    assert 0.70 < frac < 0.92                # 13/16 expected, hash noise
